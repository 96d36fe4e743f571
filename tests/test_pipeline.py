"""Pipeline parallelism (core.pipeline): the GPipe schedule over a ``pipe``
mesh axis must reproduce the sequential layer stack exactly — both for a
synthetic MLP stack and for the real VidHRFormer decoder blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.core.pipeline import (make_pipeline_mesh, pipeline_apply,
                                    stack_layer_params)


def _mlp_layers(L, D, seed=0):
    rng = np.random.default_rng(seed)
    return [{"w": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)
                              * 0.2),
             "b": jnp.asarray(rng.standard_normal((D,)).astype(np.float32))}
            for _ in range(L)]


def _mlp(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


@pytest.mark.parametrize("L,S,M", [(8, 4, 4), (8, 8, 3), (4, 2, 1)])
def test_pipeline_matches_sequential_mlp(L, S, M):
    """S stages × L/S layers each over M microbatches == the sequential
    stack, including bubble-dominated (M < S) and single-microbatch cases."""
    if len(jax.devices()) < S:
        pytest.skip("needs the 8-virtual-device mesh")
    B, D = 2, 16
    layers = _mlp_layers(L, D)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((M, B, D)).astype(np.float32))

    expect = x
    for p in layers:
        expect = _mlp(p, expect)  # layers act per-row: batch form == per-mb

    mesh = make_pipeline_mesh(stages=S)
    got = pipeline_apply(_mlp, stack_layer_params(layers), x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-6)


def test_pipeline_decoder_blocks_parity():
    """The decoder's L identical blocks (the PP target shape) stream through
    a 4-stage pipeline with exact parity to the sequential loop of
    VidHRFormerDecoderNAR (nn/vidhrformer.py): stacked layer params +
    batch_stats, shared (memory, positions, event-query) closure."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-virtual-device mesh")
    from npvp_tpu.nn.vidhrformer import VidHRFormerBlockDecNAR

    C, heads, ws, L = 16, 4, 4, 4
    N, To, TP, H, W = 2, 2, 2, 4, 4
    block = VidHRFormerBlockDecNAR(C, heads, ws, 0.0, 0.0, 2, 32, "layer",
                                   dtype=jnp.float32)
    rng = np.random.default_rng(3)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    query_evt = f32(N, 1, H, W, C)
    memory = f32(N, To, H, W, C)
    mem_pos = (f32(To * H * W, C), f32(To * H * W, C))
    tgt_pos = (f32(TP * H * W, C), f32(TP * H * W, C))
    tgt0 = f32(N, TP, H, W, C)

    variables = [block.init(jax.random.key(i), tgt0, query_evt, memory,
                            mem_pos, tgt_pos) for i in range(L)]

    def apply_block(v, tgt):
        return block.apply(v, tgt, query_evt, memory, mem_pos, tgt_pos,
                           deterministic=True)

    expect = tgt0
    for v in variables:
        expect = apply_block(v, expect)
    expect = np.asarray(expect)

    # microbatch axis = 1 microbatch of the whole tgt (the decoder serves
    # all frames in one NAR pass; microbatching would split N)
    stacked = stack_layer_params(variables)
    mesh = make_pipeline_mesh(stages=4)
    got = pipeline_apply(apply_block, stacked, tgt0[None], mesh=mesh)[0]
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)

    # and with real microbatching over the batch axis: batch-dependent
    # shared inputs (event query, memory) travel inside the microbatch
    # pytree so each stage sees its microbatch's own conditioning
    expect_mb = []
    for n in range(2):
        h = tgt0[n:n + 1]
        for v in variables:
            h = block.apply(v, h, query_evt[n:n + 1], memory[n:n + 1],
                            mem_pos, tgt_pos, deterministic=True)
        expect_mb.append(np.asarray(h))

    def apply_block_mb(v, pack):
        tgt, q, m = pack
        return (block.apply(v, tgt, q, m, mem_pos, tgt_pos,
                            deterministic=True), q, m)

    pack = (tgt0.reshape(2, 1, TP, H, W, C),
            query_evt.reshape(2, 1, 1, H, W, C),
            memory.reshape(2, 1, To, H, W, C))
    got_mb = pipeline_apply(apply_block_mb, stacked, pack, mesh=mesh)[0]
    np.testing.assert_allclose(
        np.asarray(got_mb),
        np.stack(expect_mb).reshape(2, 1, TP, H, W, C), atol=2e-5)


def test_pipeline_composes_with_data_parallelism():
    """PP×DP: microbatches sharded over the data axis while streaming
    through the pipe axis reproduce the sequential stack — each (data, pipe)
    device row pipelines its own batch shard."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    L, S, M, B, D = 8, 4, 4, 4, 16
    layers = _mlp_layers(L, D, seed=2)
    x = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((M, B, D)).astype(np.float32))
    expect = x
    for p in layers:
        expect = _mlp(p, expect)

    mesh = make_pipeline_mesh(stages=S, data=2)
    got = pipeline_apply(_mlp, stack_layer_params(layers), x, mesh=mesh,
                         data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=1e-6)
