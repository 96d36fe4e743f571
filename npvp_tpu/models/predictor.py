"""NP-based video predictor (NPVP-D deterministic / NPVP-S stochastic).

Rebuild of the reference core model (reference models/Predictor.py:265-359):
observed frame features + continuous (t, h, w) coordinates → predicted target
frame features, non-autoregressively, for arbitrary — including fractional —
target times.

Two execution modes, one compiled program each:

- **static mode**: observed/target tensors have their natural (To, TP) shapes
  and coordinates are passed explicitly; used for fixed-split training (VFP /
  VFI) and inference. Arbitrary ``to_list`` / ``tp_list`` (the reference's
  ``reset_pos_coor`` continuous-time API) are just different *inputs*, so one
  jitted program serves VFP / VPE / VFI / VRC / HVRC without recompiling as
  long as (To, TP) shapes match; each new shape compiles once.
- **masked mode**: unified / rand-context training. Tensors keep the full
  ``max_T`` layout and boolean ``obs_mask`` / ``tgt_mask`` select the split;
  attention masks and masked means make the result equal to the compact
  computation. The reference instead re-slices tensors per batch
  (models/Predictor.py:241-251) which would trigger an XLA recompilation
  storm — masks keep one static program for every split.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from npvp_tpu.nn.layers import TokenLayerNorm
from npvp_tpu.nn.neural_process import NRMLP, EventEncoder, pos_feat_fuse
from npvp_tpu.nn.vidhrformer import (VidHRFormerDecoderNAR, VidHRFormerEncoder,
                                     encoder_temporal_allow)


class PredictorOutput(NamedTuple):
    pred_features: jnp.ndarray            # (N, TP, H, W, C) — ReLU'd
    mu_o: Optional[jnp.ndarray] = None    # prior mean (N, H, W, C)
    logvar_o: Optional[jnp.ndarray] = None
    mu_p: Optional[jnp.ndarray] = None    # posterior mean
    logvar_p: Optional[jnp.ndarray] = None


class NPPredictor(nn.Module):
    """The NP predictor: NRMLP coordinate conditioning → EVT-Former event
    coding → prior/posterior latent → event queries → NAR decoder."""

    embed_dim: int = 512
    num_heads: int = 8
    window_size: int = 4
    transformer_layers: int = 8
    evt_former: bool = True
    evt_former_num_layers: int = 4
    evt_hidden_channels: int = 256
    evt_n_layers: int = 1
    stochastic: bool = False
    fuse_method: str = "Add"
    norm_type: str = "layer"
    dropout: float = 0.1
    drop_path: float = 0.1
    ffn_hidden_ratio: int = 4
    dim_feedforward: int = 1024
    exec_mode: str = "xla"
    affine_posfuse: Optional[bool] = None  # None = auto by fuse/norm type
    remat: bool = False  # rematerialize transformer blocks under grad
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # positional fusion folds through the q/k projections when it is an
        # affine map of the input — 'layer' norm + 'Add' fusion, the shipped
        # default (see nn/vidhrformer.py frame_affine_stats). SPADE or other
        # norms use the generic pre-fused path.
        affine = (self.fuse_method == "Add" and self.norm_type == "layer")
        if self.affine_posfuse is not None:
            affine = self.affine_posfuse and affine
        self.nrmlp = NRMLP(out_channels=self.embed_dim,
                           fuse_method=self.fuse_method, dtype=self.dtype)
        if self.evt_former:
            self.evt_former_stack = VidHRFormerEncoder(
                self.evt_former_num_layers, self.embed_dim, self.num_heads,
                self.window_size, self.dropout, self.drop_path,
                self.ffn_hidden_ratio, self.dim_feedforward, self.norm_type,
                affine_posfuse=affine, remat=self.remat,
                exec_mode=self.exec_mode, dtype=self.dtype)
        self.evt_posterior = EventEncoder(
            self.evt_hidden_channels, self.evt_n_layers,
            stochastic=self.stochastic, dtype=self.dtype)
        if self.stochastic:
            self.evt_prior = EventEncoder(
                self.evt_hidden_channels, self.evt_n_layers,
                stochastic=True, dtype=self.dtype)
        self.decoder = VidHRFormerDecoderNAR(
            self.transformer_layers, self.embed_dim, self.num_heads,
            self.window_size, self.dropout, self.drop_path,
            self.ffn_hidden_ratio, self.dim_feedforward, self.norm_type,
            affine_posfuse=affine, remat=self.remat,
            exec_mode=self.exec_mode, dtype=self.dtype)
        # One LayerNorm instance shared between the EVT-Former output and the
        # decoder output — replicates the reference's shared default-arg norm
        # (models/Predictor.py:270: the same nn.LayerNorm(512) object is passed
        # to both stacks).
        self.final_norm = TokenLayerNorm(epsilon=1e-5,
                                         dtype=self.dtype)

    def event_coding(self, feats, pos_beta, pos_gamma, mask=None,
                     deterministic=True):
        """EVT-Former over context features → (per-frame features, pooled event
        coding) (reference models/Predictor.py:337-350, evt_token=False path:
        event coding is the temporal mean of the encoded frames)."""
        T = feats.shape[1]
        if mask is not None:
            feats = feats * mask.astype(feats.dtype)[None, :, None, None, None]
        if self.evt_former:
            allow = encoder_temporal_allow(T, mask)
            x = self.evt_former_stack(feats, pos_beta, pos_gamma, allow,
                                      deterministic)
            x = self.final_norm(x)
        else:
            x = pos_feat_fuse(feats, pos_beta, pos_gamma, self.norm_type)
        if mask is None:
            coding = jnp.mean(x, axis=1)
        else:
            m = mask.astype(x.dtype)
            coding = jnp.einsum("nthwc,t->nhwc", x, m) / jnp.maximum(
                jnp.sum(m), 1.0)
        return x, coding

    def __call__(self,
                 observed_feats: jnp.ndarray,
                 obs_coords: jnp.ndarray,
                 tgt_coords: jnp.ndarray,
                 num_target: int,
                 target_feats_gt: Optional[jnp.ndarray] = None,
                 obs_mask: Optional[jnp.ndarray] = None,
                 tgt_mask: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 sample_latent: bool = True) -> PredictorOutput:
        """Predict target-time features.

        Args:
          observed_feats: (N, To, H, W, C) context features (frozen AE
            encodings). In masked mode To == max_T (full clip).
          obs_coords / tgt_coords: (To*H*W, 3) / (TP*H*W, 3) normalized
            coordinate grids.
          num_target: TP (static python int; must match tgt_coords).
          target_feats_gt: ground-truth target features, required when
            training the stochastic model (posterior path).
          obs_mask / tgt_mask: optional (T,) booleans enabling masked mode.
          train: training mode (dropout/droppath active, posterior latent
            used — reference models/Predictor.py:315-322).
          sample_latent: draw z via reparameterization (True) or use the
            mean (False).
        """
        deterministic = not train
        op_beta, op_gamma = self.nrmlp(obs_coords)
        pp_beta, pp_gamma = self.nrmlp(tgt_coords)

        memory, observe_coding = self.event_coding(
            observed_feats, op_beta, op_gamma, obs_mask, deterministic)

        self_allow = None
        cross_allow = None
        if tgt_mask is not None:
            Tq = num_target
            self_allow = jnp.broadcast_to(tgt_mask.astype(bool)[None, :],
                                          (Tq, Tq))
        if obs_mask is not None:
            To = observed_feats.shape[1]
            cross_allow = jnp.broadcast_to(obs_mask.astype(bool)[None, :],
                                           (num_target, To))

        if self.stochastic:
            zo, mu_o, logvar_o = self.evt_prior(
                observe_coding, train=train, sample=sample_latent)
            mu_p = logvar_p = None
            zp = None
            if target_feats_gt is not None:
                _, predict_coding = self.event_coding(
                    target_feats_gt, pp_beta, pp_gamma, tgt_mask,
                    deterministic)
                zp, mu_p, logvar_p = self.evt_posterior(
                    predict_coding, train=train, sample=sample_latent)
            # training uses the posterior sample, inference the prior sample
            z = zp if (train and zp is not None) else zo
            # the event query is identical at every target time (reference
            # models/Predictor.py:317 repeats it); keep it (N, 1, H, W, C)
            # and let the decoder broadcast — the repeat never materializes
            query_evt = z[:, None]
            out = self.decoder(query_evt, memory, (op_beta, op_gamma),
                               (pp_beta, pp_gamma), self_allow, cross_allow,
                               deterministic)
            out = nn.relu(self.final_norm(out))
            return PredictorOutput(out, mu_o, logvar_o, mu_p, logvar_p)
        else:
            mu_o = self.evt_posterior(observe_coding, train=train)
            query_evt = mu_o[:, None]
            out = self.decoder(query_evt, memory, (op_beta, op_gamma),
                               (pp_beta, pp_gamma), self_allow, cross_allow,
                               deterministic)
            out = nn.relu(self.final_norm(out))
            return PredictorOutput(out)


def build_predictor(cfg, dtype=jnp.float32,
                    exec_mode: Optional[str] = None) -> NPPredictor:
    """Construct an NPPredictor from a Config (npvp_tpu.core.config).

    ``exec_mode`` overrides ``cfg.Predictor.exec_mode``: "xla" (composable,
    training/autodiff), "int8" (dynamic-int8 serving matmuls), or "pallas"
    (fused temporal/cross attention kernel on the deterministic serving
    path — npvp_tpu.kernels.temporal_attention). One parameter set serves
    every mode."""
    p = cfg.Predictor
    return NPPredictor(
        embed_dim=p.embed_dim,
        num_heads=p.num_heads,
        window_size=p.window_size,
        transformer_layers=p.transformer_layers,
        evt_former=p.evt_former,
        evt_former_num_layers=p.evt_former_num_layers,
        evt_hidden_channels=p.evt_hidden_channels,
        stochastic=p.stochastic,
        fuse_method=p.fuse_method,
        norm_type=p.param_free_norm_type,
        dropout=p.dropout,
        drop_path=p.drop_path,
        ffn_hidden_ratio=p.Spatial_FFN_hidden_ratio,
        dim_feedforward=p.dim_feedforward,
        exec_mode=exec_mode if exec_mode is not None else p.exec_mode,
        remat=p.remat,
        dtype=dtype,
    )
