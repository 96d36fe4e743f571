"""Inference API: one trained unified model serving the five tasks.

Equivalent of the reference's notebook-driven inference
(reference Inference.ipynb cells 1-4 + models/Predictor.py:352-359
``reset_pos_coor``): a task is *only* a choice of observed/target time
coordinate lists —

- VFP  — observe 0..P-1, generate P..T-1 (future prediction)
- VPE  — observe the tail, generate the head (past extrapolation)
- VFI  — observe both ends, generate the middle (interpolation)
- VRC  — arbitrary observed/target index split (random completion)
- HVRC — fractional target times (continuous temporal super-resolution)

TPU design: the whole pipeline (AE encode → predictor → AE decode) is one
jitted program; programs are cached per (To, TP) shape, so repeated calls with
new coordinate *values* (including fractional times) never recompile.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.core.config import Config
from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
from npvp_tpu.models.predictor import NPPredictor, build_predictor
from npvp_tpu.nn.resnet_ae import FrameAutoEncoder


class VideoPredictor:
    """Frozen AE + trained NP predictor with a continuous-time query API."""

    def __init__(self, cfg: Config, ae: FrameAutoEncoder, ae_vars: dict,
                 predictor: NPPredictor, predictor_vars: dict):
        self.cfg = cfg
        self.ae = ae
        self.ae_vars = ae_vars
        self.predictor = predictor
        self.predictor_vars = predictor_vars
        p = cfg.Predictor
        self.h_list, self.w_list = spatial_index_lists(p.max_H, p.max_W)
        self._compiled = {}

    # -- construction --------------------------------------------------------
    @classmethod
    def from_checkpoints(cls, cfg: Config, ae_ckpt_dir: str,
                         predictor_ckpt_dir: str,
                         dtype=jnp.bfloat16,
                         exec_mode: Optional[str] = None) -> "VideoPredictor":
        from npvp_tpu.train.stage1_ae import build_ae, init_state
        from npvp_tpu.train.stage2_predictor import init_predictor_state
        from npvp_tpu.core.checkpoint import CheckpointManager

        if str(predictor_ckpt_dir).endswith(".npz"):
            # a committed weights artifact (tools/export_weights.py) holds
            # BOTH the frozen AE and the predictor variables
            return cls.from_weights(cfg, predictor_ckpt_dir, dtype=dtype,
                                    exec_mode=exec_mode)
        ae = build_ae(cfg, dtype)
        d = cfg.Dataset
        clip_len = d.num_past_frames + d.num_future_frames
        ae_state = CheckpointManager(ae_ckpt_dir).restore(
            init_state(cfg, ae, (1, clip_len, d.img_size, d.img_size,
                                 d.img_channels)))
        predictor = build_predictor(cfg, dtype, exec_mode=exec_mode)
        pred_state = CheckpointManager(predictor_ckpt_dir).restore(
            init_predictor_state(cfg, predictor, 1))
        return cls(cfg, ae,
                   {"params": ae_state.params,
                    "batch_stats": ae_state.batch_stats},
                   predictor,
                   {"params": pred_state.params,
                    "batch_stats": pred_state.batch_stats})

    @classmethod
    def from_weights(cls, cfg: Config, npz_path,
                     dtype=jnp.bfloat16,
                     exec_mode: Optional[str] = None) -> "VideoPredictor":
        """Build from a committed weights artifact (one .npz holding AE +
        predictor params/batch_stats — npvp_tpu/tools/export_weights.py)."""
        from npvp_tpu.tools.export_weights import load_weights
        from npvp_tpu.train.stage1_ae import build_ae

        ae_vars, pred_vars, _meta = load_weights(npz_path)
        ae = build_ae(cfg, dtype)
        predictor = build_predictor(cfg, dtype, exec_mode=exec_mode)
        as_jnp = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
        return cls(cfg, ae, as_jnp(ae_vars), predictor, as_jnp(pred_vars))

    @classmethod
    def from_random_init(cls, cfg: Config, dtype=jnp.bfloat16, seed: int = 0,
                         exec_mode: Optional[str] = None) -> "VideoPredictor":
        """Random weights — for benchmarking/compile checks."""
        from npvp_tpu.train.stage1_ae import build_ae

        d, p = cfg.Dataset, cfg.Predictor
        ae = build_ae(cfg, dtype)
        ae_vars = ae.init(jax.random.key(seed),
                          jnp.zeros((1, 2, d.img_size, d.img_size,
                                     d.img_channels)))
        predictor = build_predictor(cfg, dtype, exec_mode=exec_mode)
        feats = jnp.zeros((1, 2, p.max_H, p.max_W, p.embed_dim))
        oc = jnp.zeros((2 * p.max_H * p.max_W, 3))
        pred_vars = predictor.init(
            {"params": jax.random.key(seed + 1),
             "latent": jax.random.key(seed + 2)}, feats, oc, oc, 2)
        return cls(cfg, ae, ae_vars, predictor, pred_vars)

    def shard(self, mesh) -> "VideoPredictor":
        """Place the model on a multi-chip mesh for serving: parameters get
        the tensor-parallel layout (attention heads / FFN hidden over the
        ``model`` axis, everything else replicated) and subsequent
        ``predict*`` calls shard their batch over the ``data`` axis. The
        same jitted programs serve single- and multi-chip — jit follows the
        argument placements.

        Returns self (placement is in-place on the variable pytrees)."""
        from npvp_tpu.core.mesh import replicated, shard_params

        self.ae_vars = {
            "params": jax.device_put(self.ae_vars["params"],
                                     replicated(mesh)),
            "batch_stats": jax.device_put(self.ae_vars["batch_stats"],
                                          replicated(mesh)),
        }
        self.predictor_vars = {
            "params": shard_params(mesh, self.predictor_vars["params"]),
            "batch_stats": jax.device_put(
                self.predictor_vars["batch_stats"], replicated(mesh)),
        }
        self._mesh = mesh
        self._compiled = {}
        return self

    def _place_frames(self, frames, batch_axis: int = 0) -> jnp.ndarray:
        """Shard ``batch_axis`` over the data axis after :meth:`shard`
        (streams carry their batch at axis 1), no-op otherwise."""
        mesh = getattr(self, "_mesh", None)
        if mesh is None:
            return jnp.asarray(frames)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from npvp_tpu.core.mesh import DATA_AXIS

        frames = np.asarray(frames)
        if frames.shape[batch_axis] % mesh.shape[DATA_AXIS]:
            # indivisible batch: true replication (an uncommitted array would
            # only work by accident next to mesh-sharded params, and silently
            # drops data parallelism — warn so the caller can pad the batch)
            import warnings

            warnings.warn(
                f"batch size {frames.shape[batch_axis]} does not divide the "
                f"data axis ({mesh.shape[DATA_AXIS]} devices); replicating — "
                "data parallelism is lost for this call", stacklevel=3)
            return jax.device_put(frames, NamedSharding(mesh, P()))
        spec = [None] * frames.ndim
        spec[batch_axis] = DATA_AXIS
        return jax.device_put(frames, NamedSharding(mesh, P(*spec)))

    # -- core ---------------------------------------------------------------
    def _pipeline(self, num_target: int):
        """Build + cache the jitted frames→frames program for a TP size."""
        key = num_target

        if key not in self._compiled:
            def run(ae_vars, pred_vars, frames, obs_coords, tgt_coords,
                    latent_key):
                feats = self.ae.apply(ae_vars, frames, train=False,
                                      method=FrameAutoEncoder.encode)
                out = self.predictor.apply(
                    pred_vars, feats, obs_coords, tgt_coords, num_target,
                    rngs={"latent": latent_key})
                pred = self.ae.apply(ae_vars, out.pred_features, train=False,
                                     method=FrameAutoEncoder.decode)
                return pred

            self._compiled[key] = jax.jit(run, static_argnums=())
        return self._compiled[key]

    def _coords(self, t_list) -> jnp.ndarray:
        p = self.cfg.Predictor
        return coordinate_grid(jnp.asarray(t_list, jnp.float32), self.h_list,
                               self.w_list, p.max_T, p.max_H, p.max_W)

    def freeze_task(self, to_list: Sequence[float],
                    tp_list: Sequence[float]):
        """Compile a coordinate-specialized program for a *repeated* task.

        :meth:`predict` passes coordinates as runtime data — any (fractional)
        times without recompiling, the flexible default — but paying ~25%
        on-chip vs baking the coordinates into the program as constants
        (measured round 2, bench.py). Serving usually applies ONE task shape
        (e.g. VFP 10→10) to every request, so this returns a callable
        ``fn(observed_frames, rng=None) -> (N, TP, H, W, C)`` whose
        coordinate grids are compile-time constants: the public-API path that
        realizes the headline benchmark number. Programs are cached by
        coordinate *values*; calling again with the same task is free.
        """
        to_list = np.asarray(to_list, np.float32)
        tp_list = np.asarray(tp_list, np.float32)
        key = ("frozen", to_list.tobytes(), tp_list.tobytes())
        if key not in self._compiled:
            oc = self._coords(to_list)
            tc = self._coords(tp_list)
            num_target = len(tp_list)

            @jax.jit
            def run(ae_vars, pred_vars, frames, latent_key):
                feats = self.ae.apply(ae_vars, frames, train=False,
                                      method=FrameAutoEncoder.encode)
                out = self.predictor.apply(
                    pred_vars, feats, oc, tc, num_target,
                    rngs={"latent": latent_key})
                return self.ae.apply(ae_vars, out.pred_features, train=False,
                                     method=FrameAutoEncoder.decode)

            self._compiled[key] = run
        fn = self._compiled[key]
        n_obs = len(to_list)

        def predict_frozen(observed_frames,
                           rng: Optional[jax.Array] = None) -> jnp.ndarray:
            assert observed_frames.shape[1] == n_obs, (
                f"frozen task observes {n_obs} frames, "
                f"got {observed_frames.shape[1]}")
            r = rng if rng is not None else jax.random.key(0)
            return fn(self.ae_vars, self.predictor_vars,
                      self._place_frames(observed_frames), r)

        predict_frozen.jit_fn = fn  # for AOT introspection (bench.py)
        return predict_frozen

    # -- serialized serving bundles ------------------------------------------
    def export_task(self, path: str, to_list: Sequence[float],
                    tp_list: Sequence[float], batch_size: int,
                    platforms: Sequence[str] = ("cpu", "tpu")) -> None:
        """Serialize the coordinate-specialized serving program to a
        self-contained on-disk bundle: ``program.jaxexport`` (StableHLO via
        ``jax.export``, lowered for every platform in ``platforms`` — a CPU
        host can produce a TPU serving artifact) + ``variables.pkl``
        (weights) + ``meta.json`` (shapes/task).

        The bundle decouples serving from the model code: a server process
        needs only jax and :meth:`serve_exported` — no flax modules, no
        config, no tracing. Shapes are static (``batch_size`` clips of
        ``len(to_list)`` observed frames), matching the reference's
        fixed-task serving (Inference.ipynb cells 2-4: one task shape per
        notebook run); export one bundle per task shape. The rng enters as
        raw ``jax.random.key_data`` so the artifact's calling convention is
        plain arrays only.
        """
        import json
        import pickle
        from pathlib import Path

        import jax.export as jexport

        to_list = np.asarray(to_list, np.float32)
        tp_list = np.asarray(tp_list, np.float32)
        oc = self._coords(to_list)
        tc = self._coords(tp_list)
        num_target = len(tp_list)

        def run(ae_vars, pred_vars, frames, key_data):
            key = jax.random.wrap_key_data(key_data)
            feats = self.ae.apply(ae_vars, frames, train=False,
                                  method=FrameAutoEncoder.encode)
            out = self.predictor.apply(
                pred_vars, feats, oc, tc, num_target,
                rngs={"latent": key})
            return self.ae.apply(ae_vars, out.pred_features, train=False,
                                 method=FrameAutoEncoder.decode)

        d = self.cfg.Dataset
        frames_sds = jax.ShapeDtypeStruct(
            (batch_size, len(to_list), d.img_size, d.img_size,
             d.img_channels), jnp.float32)
        key_data = jax.random.key_data(jax.random.key(0))
        key_sds = jax.ShapeDtypeStruct(key_data.shape, key_data.dtype)
        sds = lambda tree: jax.tree_util.tree_map(
            lambda l: jax.ShapeDtypeStruct(jnp.shape(l), jnp.asarray(l).dtype),
            tree)
        exported = jexport.export(jax.jit(run), platforms=list(platforms))(
            sds(self.ae_vars), sds(self.predictor_vars), frames_sds, key_sds)

        out_dir = Path(path)
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / "program.jaxexport").write_bytes(exported.serialize())
        to_np = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
        (out_dir / "variables.pkl").write_bytes(pickle.dumps(
            {"ae_vars": to_np(self.ae_vars),
             "predictor_vars": to_np(self.predictor_vars)}))
        (out_dir / "meta.json").write_text(json.dumps({
            "to_list": to_list.tolist(), "tp_list": tp_list.tolist(),
            "batch_size": batch_size, "platforms": list(platforms),
            "frames_shape": list(frames_sds.shape)}))

    @staticmethod
    def serve_exported(path: str):
        """Load a bundle written by :meth:`export_task` and return
        ``fn(observed_frames, rng=None) -> (N, TP, H, W, C)``.

        Model-code-free serving: only the serialized program + weights are
        used; the returned callable compiles the exported StableHLO for the
        local backend on first call.
        """
        import json
        import pickle
        from pathlib import Path

        import jax.export as jexport

        out_dir = Path(path)
        exported = jexport.deserialize(
            (out_dir / "program.jaxexport").read_bytes())
        variables = pickle.loads((out_dir / "variables.pkl").read_bytes())
        meta = json.loads((out_dir / "meta.json").read_text())
        expect = tuple(meta["frames_shape"])
        B = expect[0]

        def serve(observed_frames, rng: Optional[jax.Array] = None):
            frames = jnp.asarray(observed_frames, jnp.float32)
            assert frames.shape[1:] == expect[1:], (
                f"exported task takes frames (N,)+{expect[1:]}, "
                f"got {frames.shape}")
            key = rng if rng is not None else jax.random.key(0)
            n = frames.shape[0]
            # the program has a static batch B: chunk larger requests, pad
            # the remainder (clips are independent — BN runs on frozen
            # statistics — so padding rows never leak into real rows)
            outs = []
            for c, i in enumerate(range(0, n, B)):
                chunk = frames[i: i + B]
                m = chunk.shape[0]
                if m < B:
                    chunk = jnp.concatenate(
                        [chunk, jnp.zeros((B - m,) + expect[1:],
                                          chunk.dtype)])
                # chunk 0 uses the caller's key unchanged (exact parity
                # with the live freeze_task program); later chunks fold in
                # their index for fresh latent draws
                k = key if c == 0 else jax.random.fold_in(key, c)
                out = exported.call(
                    variables["ae_vars"], variables["predictor_vars"],
                    chunk, jax.random.key_data(k))
                outs.append(out[:m])
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

        serve.meta = meta
        return serve

    def predict(self, observed_frames, to_list: Sequence[float],
                tp_list: Sequence[float],
                rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """observed_frames: (N, To, H, W, C) normalized frames observed at
        times ``to_list``; returns (N, TP, H, W, C) frames at ``tp_list``.
        Arbitrary (fractional) times are data, not shapes — no recompile."""
        to_list = np.asarray(to_list, np.float32)
        tp_list = np.asarray(tp_list, np.float32)
        assert observed_frames.shape[1] == len(to_list)
        fn = self._pipeline(len(tp_list))
        rng = rng if rng is not None else jax.random.key(0)
        return fn(self.ae_vars, self.predictor_vars,
                  self._place_frames(observed_frames),
                  self._coords(to_list), self._coords(tp_list), rng)

    # -- the five tasks ------------------------------------------------------
    def vfp(self, past_frames, num_future: int, rng=None):
        """Future prediction; transparently extends beyond the trained time
        range with the sliding-window protocol (see :meth:`vfp_windowed`).

        The KTH test protocol (BASELINE.md: 10 observed → 20 predicted with
        max_T=20) queries target times 20..29, which exceed the trained
        coordinate range — the reference *asserts* t ≤ max_T
        (models/submodules.py:349-351) and its notebook never queries beyond
        it, so windows of ≤ max_T frames with a re-based time origin are the
        only in-range decomposition of the protocol.
        """
        P = past_frames.shape[1]
        if P + num_future > self.cfg.Predictor.max_T:
            return self.vfp_windowed(past_frames, num_future, rng)
        return self.predict(past_frames, np.arange(P),
                            np.arange(P, P + num_future), rng)

    def vfp_windowed(self, past_frames, num_future: int, rng=None,
                     chunk: Optional[int] = None):
        """Sliding-window future prediction for horizons beyond max_T.

        Each window observes the last P frames (times re-based to 0..P-1 —
        the model is translation-equivariant across windows because training
        samples every clip position) and predicts the next ``max_T - P``
        frames; predictions roll into the next window's context. All windows
        share one (To, TP) shape, so the whole horizon runs a single compiled
        program.

        ``chunk`` overrides the per-window horizon (default: the maximum
        in-range ``max_T - P``). A smaller chunk forces more windows — used
        to *measure* the windowed protocol's quality cost on horizons that
        also fit a single direct window (tools/window_drift.py, round-2
        VERDICT item 5).
        """
        P = past_frames.shape[1]
        max_chunk = self.cfg.Predictor.max_T - P
        chunk = max_chunk if chunk is None else chunk
        if chunk <= 0 or chunk > max_chunk:
            raise ValueError(f"window horizon {chunk} outside (0, "
                             f"{max_chunk}] for context {P} with "
                             f"max_T={self.cfg.Predictor.max_T}")
        rng = rng if rng is not None else jax.random.key(0)
        ctx = jnp.asarray(past_frames)
        preds = []
        produced = 0
        while produced < num_future:
            rng, sub = jax.random.split(rng)
            out = self.predict(ctx, np.arange(P), np.arange(P, P + chunk),
                               sub)
            preds.append(out)
            produced += chunk
            ctx = jnp.concatenate([ctx, out], axis=1)[:, -P:]
        return jnp.concatenate(preds, axis=1)[:, :num_future]

    def vpe(self, future_frames, num_past: int, rng=None):
        F = future_frames.shape[1]
        return self.predict(future_frames, np.arange(num_past, num_past + F),
                            np.arange(num_past), rng)

    def vfi(self, boundary_frames, context_p: int, context_f: int,
            num_interpolate: int, rng=None):
        total = context_p + context_f + num_interpolate
        to = np.concatenate([np.arange(context_p),
                             np.arange(total - context_f, total)])
        tp = np.arange(context_p, total - context_f)
        return self.predict(boundary_frames, to, tp, rng)

    def vrc(self, observed_frames, observed_times, target_times, rng=None):
        return self.predict(observed_frames, observed_times, target_times,
                            rng)

    def hvrc(self, observed_frames, observed_times, target_times, rng=None):
        """Continuous generation: ``target_times`` may be fractional."""
        return self.predict(observed_frames, observed_times, target_times,
                            rng)

    def reconstruct(self, frames):
        """AE round-trip (the reference forward also returns reconstructions,
        models/Predictor.py:72-86)."""
        rec, _ = self.ae.apply(self.ae_vars, jnp.asarray(frames), train=False)
        return rec

    # -- device-resident streaming ------------------------------------------
    def predict_stream(self, frames_stream, to_list: Sequence[float],
                       tp_list: Sequence[float],
                       rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Serve a stream of batches in ONE device program.

        frames_stream: (S, N, To, H, W, C) — S batches observed at times
        ``to_list``. Returns (S, N, TP, H, W, C). The S-loop runs on-device
        (lax.scan), so per-call host dispatch overhead is paid once per
        *stream* instead of once per batch — on tunneled/remote runtimes the
        dispatch gap otherwise dominates (measured ≈10-45 ms/dispatch vs
        ~90 ms device compute for a batch-64 pipeline; CLAUDE.md). All S
        outputs materialize in HBM.
        """
        to_list = np.asarray(to_list, np.float32)
        tp_list = np.asarray(tp_list, np.float32)
        # coordinates are jit ARGUMENTS (times are data, not shapes — same
        # rule as predict()): one cached program per (S, To, TP) shape, any
        # coordinate values
        key = (int(frames_stream.shape[0]), len(to_list), len(tp_list),
               "stream")
        if key not in self._compiled:
            num_target = len(tp_list)

            from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

            def run(ae_vars, pred_vars, stream, oc, tc, rng0):
                def body(carry_rng, frames):
                    feats = self.ae.apply(ae_vars, frames, train=False,
                                          method=FrameAutoEncoder.encode)
                    out = self.predictor.apply(
                        pred_vars, feats, oc, tc, num_target,
                        rngs={"latent": carry_rng})
                    pred = self.ae.apply(ae_vars, out.pred_features,
                                         train=False,
                                         method=FrameAutoEncoder.decode)
                    return jax.random.fold_in(carry_rng, 1), pred

                _, preds = jax.lax.scan(body, rng0, stream)
                return preds

            self._compiled[key] = jax.jit(run)
        rng = rng if rng is not None else jax.random.key(0)
        return self._compiled[key](self.ae_vars, self.predictor_vars,
                                   self._place_frames(frames_stream,
                                                      batch_axis=1),
                                   self._coords(to_list),
                                   self._coords(tp_list), rng)
