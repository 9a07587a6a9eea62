"""Pallas GRU kernel: parity vs the lax.scan reference, gradient flow
through the custom VJP, and wiring into StackedGRU.

CPU runs use interpreter mode; ``test_gru_native_tpu`` compiles the real
kernel and is skipped off-TPU (the ``pallas`` lane of ``bench.py``
exercises compile + parity + timing on the attached chip).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pb_sed_tpu.ops.pallas.gru import gru_scan, gru_scan_reference


def _assert_close_bf16(got, ref):
    """Tolerance scaled to the reference magnitude: bf16 matmul inputs
    with f32 accumulation drift ~0.4%% of max per pass (measured <=0.2%%
    across the suite's shapes)."""
    ref = np.asarray(ref)
    atol = 1e-4 + 6e-3 * float(np.max(np.abs(ref)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=atol)


def make_inputs(d=1, b=4, t=37, h=16, seed=0):
    rng = np.random.RandomState(seed)
    xw = rng.randn(d, b, t, 3 * h).astype(np.float32)
    w_hh = (rng.randn(d, h, 3 * h) / np.sqrt(h)).astype(np.float32)
    b_hh = rng.randn(d, 3 * h).astype(np.float32) * .1
    h0 = rng.randn(d, b, h).astype(np.float32) * .1
    return jnp.asarray(xw), jnp.asarray(w_hh), jnp.asarray(b_hh), \
        jnp.asarray(h0)


def test_gru_kernel_matches_scan_interpret():
    # the kernel runs bf16 MXU matmuls with f32 accumulation; vs the
    # f32 interpreter reference that is ~2e-3 drift (measured)
    xw, w_hh, b_hh, h0 = make_inputs()
    y_ref = gru_scan_reference(xw, w_hh, b_hh, h0)
    y = gru_scan(xw, w_hh, b_hh, h0, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=5e-3)


def test_gru_kernel_bidirectional_and_time_blocking():
    # t=70 with block_t=64 exercises the padded tail; d=2 the direction
    # grid axis
    xw, w_hh, b_hh, h0 = make_inputs(d=2, b=3, t=70, h=8, seed=1)
    y_ref = gru_scan_reference(xw, w_hh, b_hh, h0)
    y = gru_scan(xw, w_hh, b_hh, h0, True)
    assert y.shape == (2, 3, 70, 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=5e-3)


def test_gru_kernel_gradients_flow():
    """The custom VJP (scan-path backward) must match autodiff of the
    reference scan exactly."""
    xw, w_hh, b_hh, h0 = make_inputs(b=2, t=9, h=8, seed=2)

    def loss_pallas(*args):
        return jnp.sum(jnp.square(gru_scan(*args, True)))

    def loss_ref(*args):
        return jnp.sum(jnp.square(gru_scan_reference(*args)))

    grads_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(
        xw, w_hh, b_hh, h0)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        xw, w_hh, b_hh, h0)
    for gp, gr in zip(grads_p, grads_r):
        _assert_close_bf16(gp, gr)


def test_stacked_gru_use_pallas_wiring():
    """StackedGRU(use_pallas=True) selects the kernel (forced to
    interpreter mode on CPU) and matches the scan path within
    bf16-vs-f32 tolerance; in default 'auto' mode CPU falls back to the
    scan path exactly."""
    from pb_sed_tpu.ops import rnn as rnn_mod
    from pb_sed_tpu.ops.rnn import StackedGRU
    rnn_mod.set_pallas_mode('force_interpret')
    try:
        _run_pallas_wiring_check()
    finally:
        rnn_mod.set_pallas_mode('auto')
    # 'auto' on CPU: use_pallas falls back to the scan path bit-exactly
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 21, 12).astype(np.float32))
    seq_len = jnp.asarray([21, 15])
    scan_gru = StackedGRU(hidden_size=16, num_layers=1)
    variables = scan_gru.init(jax.random.PRNGKey(0), x, seq_len)
    y_scan = scan_gru.apply(variables, x, seq_len)
    y_auto = StackedGRU(hidden_size=16, num_layers=1,
                        use_pallas=True).apply(variables, x, seq_len)
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_scan))


def _run_pallas_wiring_check():
    from pb_sed_tpu.ops.rnn import StackedGRU
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 21, 12).astype(np.float32))
    seq_len = jnp.asarray([21, 15])
    scan_gru = StackedGRU(hidden_size=16, num_layers=1)
    variables = scan_gru.init(jax.random.PRNGKey(0), x, seq_len)
    y_scan = scan_gru.apply(variables, x, seq_len)
    pallas_gru = StackedGRU(hidden_size=16, num_layers=1, use_pallas=True)
    y_pallas = pallas_gru.apply(variables, x, seq_len)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_scan),
                               atol=2e-2)
    # bidirectional path
    scan_bi = StackedGRU(hidden_size=8, num_layers=1, bidirectional=True)
    variables = scan_bi.init(jax.random.PRNGKey(1), x, seq_len)
    y_scan = scan_bi.apply(variables, x, seq_len)
    pallas_bi = StackedGRU(hidden_size=8, num_layers=1,
                           bidirectional=True, use_pallas=True)
    y_pallas = pallas_bi.apply(variables, x, seq_len)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_scan),
                               atol=2e-2)


def test_use_pallas_gates_on_hidden_size():
    """hidden_size > PALLAS_MAX_HIDDEN cannot fit the backward kernel's
    scoped-VMEM budget (measured on v5e, ops/pallas/gru.py:_bwd_blocks);
    use_pallas must take the scan path there — bit-exact equality proves
    the kernel (bf16 drift) was NOT selected even in force_interpret
    mode — and the fallback must be SURFACED (one-time warning +
    fallback record), not silent (round-3 review weak #7)."""
    import warnings
    from pb_sed_tpu.ops import fallback as fb
    from pb_sed_tpu.ops import rnn as rnn_mod
    from pb_sed_tpu.ops.rnn import StackedGRU, PALLAS_MAX_HIDDEN
    h = PALLAS_MAX_HIDDEN + 64
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    seq_len = jnp.asarray([12, 9])
    rnn_mod.set_pallas_mode('force_interpret')
    fb.reset()
    try:
        for bidi in (False, True):
            scan_gru = StackedGRU(hidden_size=h, num_layers=1,
                                  bidirectional=bidi)
            variables = scan_gru.init(jax.random.PRNGKey(2), x, seq_len)
            y_scan = scan_gru.apply(variables, x, seq_len)
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter('always')
                y_gated = StackedGRU(
                    hidden_size=h, num_layers=1, bidirectional=bidi,
                    use_pallas=True).apply(variables, x, seq_len)
            np.testing.assert_array_equal(
                np.asarray(y_gated), np.asarray(y_scan))
            assert any('PALLAS_MAX_HIDDEN' in str(w.message)
                       for w in caught), [str(w.message) for w in caught]
        assert any('PALLAS_MAX_HIDDEN' in reason
                   for _, reason in fb.fallback_records())
    finally:
        rnn_mod.set_pallas_mode('auto')
        fb.reset()


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='needs a real TPU (run via bench.py)')
def test_gru_native_tpu():
    """Non-interpret compile + parity on the actual TPU."""
    xw, w_hh, b_hh, h0 = make_inputs(d=2, b=8, t=100, h=128)
    y_ref = gru_scan_reference(xw, w_hh, b_hh, h0)
    y = gru_scan(xw, w_hh, b_hh, h0, False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-2)
    # gradient parity through BOTH hand-written kernels on hardware
    grads_p = jax.grad(
        lambda *a: jnp.sum(jnp.square(gru_scan(*a, False))),
        argnums=(0, 1, 2, 3))(xw, w_hh, b_hh, h0)
    grads_r = jax.grad(
        lambda *a: jnp.sum(jnp.square(gru_scan_reference(*a))),
        argnums=(0, 1, 2, 3))(xw, w_hh, b_hh, h0)
    for gp, gr in zip(grads_p, grads_r):
        _assert_close_bf16(gp, gr)


def test_gru_backward_multiblock_accumulation():
    """dw_hh/db_hh accumulate across batch AND (reversed) time blocks;
    time padding in the backward sweep stays inert."""
    from pb_sed_tpu.ops.pallas.gru import (
        _gru_scan_pallas, _gru_scan_pallas_bwd, _gru_scan_reference_d,
        _to_tm)
    xw, w_hh, b_hh, h0 = make_inputs(d=2, b=8, t=21, h=8, seed=4)
    y = _gru_scan_pallas(xw, w_hh, b_hh, h0, interpret=True,
                         block_b=4, block_t=8)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(_gru_scan_reference_d(xw, w_hh, b_hh, h0)), atol=5e-3)
    rng = np.random.RandomState(5)
    g = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    dxw, dw, db, dh0 = _gru_scan_pallas_bwd(
        _to_tm(xw), w_hh, b_hh, h0, y, g, interpret=True, block_b=4, block_t=8)
    _, vjp = jax.vjp(_gru_scan_reference_d, xw, w_hh, b_hh, h0)
    dxw_r, dw_r, db_r, dh0_r = vjp(g)
    _assert_close_bf16(dxw, dxw_r)
    _assert_close_bf16(dw, dw_r)
    _assert_close_bf16(db, db_r)
    _assert_close_bf16(dh0, dh0_r)


def test_gru_backward_split_matches_fused_and_reference():
    """The SPLIT backward (weight-gradient contraction outside the
    kernel — the only variant fitting scoped VMEM at H=512, and the
    faster one at H=256: 1.81 vs 2.17 ms fwd+grad on v5e) must match
    the fused kernel bit-exactly on dxw/dh0 (identical sweep math) and
    the reference VJP within bf16 tolerance on all four grads."""
    from pb_sed_tpu.ops.pallas.gru import (
        _gru_scan_pallas, _gru_scan_pallas_bwd, _gru_scan_reference_d,
        _to_tm)
    for d, b, t, h, seed in ((2, 5, 21, 16, 11), (1, 4, 11, 8, 12)):
        xw, w_hh, b_hh, h0 = make_inputs(d=d, b=b, t=t, h=h, seed=seed)
        y = _gru_scan_pallas(xw, w_hh, b_hh, h0, interpret=True,
                             block_b=4, block_t=8)
        rng = np.random.RandomState(seed + 50)
        g = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
        out_s = _gru_scan_pallas_bwd(
            _to_tm(xw), w_hh, b_hh, h0, y, g, interpret=True,
            block_b=4, block_t=8, split=True)
        out_f = _gru_scan_pallas_bwd(
            _to_tm(xw), w_hh, b_hh, h0, y, g, interpret=True,
            block_b=4, block_t=8, split=False)
        np.testing.assert_array_equal(
            np.asarray(out_s[0]), np.asarray(out_f[0]))  # dxw
        np.testing.assert_array_equal(
            np.asarray(out_s[3]), np.asarray(out_f[3]))  # dh0
        _, vjp = jax.vjp(_gru_scan_reference_d, xw, w_hh, b_hh, h0)
        for got, ref in zip(out_s, vjp(g)):
            _assert_close_bf16(got, ref)


def test_gru_backward_partial_batch_block():
    """Regression: out-of-bounds rows of a partial batch block used to
    leak into the dw_hh/db_hh accumulation matmuls; the batch is now
    zero-padded to the block size."""
    from pb_sed_tpu.ops.pallas.gru import (
        _gru_scan_pallas, _gru_scan_pallas_bwd, _gru_scan_reference_d,
        _to_tm)
    xw, w_hh, b_hh, h0 = make_inputs(d=1, b=6, t=11, h=8, seed=6)
    y = _gru_scan_pallas(xw, w_hh, b_hh, h0, interpret=True,
                         block_b=4, block_t=8)
    rng = np.random.RandomState(7)
    g = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    grads = _gru_scan_pallas_bwd(
        _to_tm(xw), w_hh, b_hh, h0, y, g, interpret=True, block_b=4, block_t=8)
    _, vjp = jax.vjp(_gru_scan_reference_d, xw, w_hh, b_hh, h0)
    for got, ref in zip(grads, vjp(g)):
        _assert_close_bf16(got, ref)


def test_paired_fbcrnn_heads_match_sequential():
    """paired_gru_apply (one D=2 kernel launch per layer for the
    FBCRNN's fwd/bwd heads) must match running the two heads
    sequentially with the SAME parameters, and both wirings must
    produce the identical parameter tree (checkpoints stay
    interchangeable)."""
    import flax.linen as nn
    from pb_sed_tpu.ops import rnn as rnn_mod
    from pb_sed_tpu.ops.rnn import (
        GRU, StackedGRU, paired_gru_apply, paired_heads)

    rnn_cfg = dict(hidden_size=16, num_layers=2, use_pallas=True,
                   input_size=12)
    out_cfg = dict(out_channels=[8, 3], kernel_size=1, norm='batch',
                   output_layer=True)

    class Heads(nn.Module):
        paired: bool

        def setup(self):
            self.rnn_fwd = GRU(rnn=dict(rnn_cfg), output_net=dict(out_cfg),
                               reverse=False)
            self.rnn_bwd = GRU(rnn=dict(rnn_cfg), output_net=dict(out_cfg),
                               reverse=True)

        def __call__(self, x, seq_len):
            if self.paired:
                assert paired_heads(self.rnn_fwd, self.rnn_bwd)
                return paired_gru_apply(
                    self.rnn_fwd, self.rnn_bwd, x, seq_len)
            sl = seq_len
            if sl is None:
                sl = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
            yf, so = self.rnn_fwd(x, sl if seq_len is not None else None)
            yb, _ = self.rnn_bwd(x, sl if seq_len is not None else None)
            return yf, yb, so

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(3, 21, 12).astype(np.float32))
    seq_len = jnp.asarray([21, 15, 8])
    rnn_mod.set_pallas_mode('force_interpret')
    try:
        v_seq = Heads(paired=False).init(jax.random.PRNGKey(0), x, seq_len)
        v_pair = Heads(paired=True).init(jax.random.PRNGKey(0), x, seq_len)
        assert jax.tree.structure(v_seq) == jax.tree.structure(v_pair)
        ref = Heads(paired=False).apply(v_seq, x, seq_len)
        got = Heads(paired=True).apply(v_seq, x, seq_len)
        for g, r in zip(got[:2], ref[:2]):
            _assert_close_bf16(g, r)
        np.testing.assert_array_equal(np.asarray(got[2]),
                                      np.asarray(ref[2]))
        # seq_len=None (sliding-window SED): reversal degenerates to a
        # plain flip in both paths
        ref_n = Heads(paired=False).apply(v_seq, x, None)
        got_n = Heads(paired=True).apply(v_seq, x, None)
        for g, r in zip(got_n[:2], ref_n[:2]):
            _assert_close_bf16(g, r)
    finally:
        rnn_mod.set_pallas_mode('auto')
    # setup-declared (input_size given) and legacy inline layer
    # construction produce the identical parameter tree
    a = StackedGRU(hidden_size=16, num_layers=2, input_size=12).init(
        jax.random.PRNGKey(1), x, seq_len)
    b = StackedGRU(hidden_size=16, num_layers=2).init(
        jax.random.PRNGKey(1), x, seq_len)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert pa.shape == pb.shape
