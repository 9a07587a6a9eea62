"""Pallas packed-lane conv2d kernels and the freq-major packed tower.

CPU runs use interpreter mode (ops/rnn.py:set_pallas_mode); on-TPU
compile + timing runs in the ``pallas`` lane of ``bench.py`` and the
TPU-gated test at the bottom. The reference for every comparison is the
unpacked XLA path (bf16 NHWC conv, masked batch norm, nn.max_pool) —
the exact code the packed tower replaces in production.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pb_sed_tpu.ops import rnn as rnn_mod
from pb_sed_tpu.ops.pallas import conv as pconv


@pytest.fixture
def interpret_mode():
    rnn_mod.set_pallas_mode('force_interpret')
    yield
    rnn_mod.set_pallas_mode('auto')


def _xla_conv(x, w, b):
    """The unpacked bf16 conv path being replaced (ops/cnn.py)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b.astype(jnp.bfloat16)


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_pack_unpack_fm_roundtrip():
    rng = np.random.RandomState(0)
    x = _rand(rng, 2, 20, 16, 16)
    g = pconv.fm_geom(20, 16, 3, 3, 16)
    assert g.fs % 128 == 0 and g.tp == g.t == 16
    x2 = pconv.pack_fm(x, g)
    assert x2.shape == (2, 16, g.ls)
    # structural slots are exactly zero = packed buffer * struct mask
    struct = pconv.lane_mask(g, jnp.float32)
    np.testing.assert_array_equal(np.asarray(x2 * struct), np.asarray(x2))
    back = pconv.unpack_fm(x2, g, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(back), np.asarray(x.astype(jnp.bfloat16).astype(
            jnp.float32)))


def test_fm_valid_mask_counts():
    g = pconv.fm_geom(10, 8, 3, 3, 16)
    seq_len = jnp.asarray([10, 4])
    m = pconv.fm_valid_mask(g, seq_len)
    assert m.shape == (2, 1, g.ls)
    np.testing.assert_array_equal(
        np.asarray(m.sum(axis=(1, 2))), np.asarray([80., 32.]))


def test_conv2d_packed_fm_matches_xla(interpret_mode):
    rng = np.random.RandomState(1)
    x = _rand(rng, 2, 20, 16, 16)
    w = _rand(rng, 3, 3, 16, 32) / 12.
    b = _rand(rng, 32) * .1
    g = pconv.fm_geom(20, 16, 3, 3, 32)
    y2 = pconv.conv2d_packed_fm(pconv.pack_fm(x, g), w, b, g, True)
    # the packed output must itself be structurally masked
    struct = pconv.lane_mask(g, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(y2 * struct), np.asarray(y2))
    g_out = g._replace()  # same geometry, new channel count
    y = pconv.unpack_fm(y2, g_out, jnp.float32)
    y_ref = np.asarray(_xla_conv(x, w, b), dtype=np.float32)
    atol = 1e-4 + 1.2e-2 * float(np.max(np.abs(y_ref)))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=atol)


def test_conv2d_packed_fm_asymmetric_kernel(interpret_mode):
    """kt != kf exercises the (time, freq) axis swap of the freq-major
    orientation (a transposition bug would misroute every tap)."""
    rng = np.random.RandomState(2)
    x = _rand(rng, 1, 12, 8, 16)
    w = _rand(rng, 5, 3, 16, 16) / 12.
    b = jnp.zeros((16,))
    g = pconv.fm_geom(12, 8, 5, 3, 16)
    y = pconv.unpack_fm(
        pconv.conv2d_packed_fm(pconv.pack_fm(x, g), w, b, g, True),
        g, jnp.float32)
    y_ref = np.asarray(_xla_conv(x, w, b), dtype=np.float32)
    atol = 1e-4 + 1.2e-2 * float(np.max(np.abs(y_ref)))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=atol)


def test_conv2d_packed_fm_single_row_blocks(interpret_mode):
    """tc=1 (the flagship L8 geometry): a whole tap row of the first /
    last block lies OUT of range — regression for the edge zero-fill
    computing head > lb / negative n there."""
    rng = np.random.RandomState(11)
    x = _rand(rng, 1, 10, 8, 16)
    w = _rand(rng, 3, 3, 16, 16) / 12.
    b = _rand(rng, 16) * .1
    base = pconv.fm_geom(10, 8, 3, 3, 16)
    g = base._replace(tc=1)
    y = pconv.unpack_fm(
        pconv.conv2d_packed_fm(pconv.pack_fm(x, g), w, b, g, True),
        g, jnp.float32)
    y_ref = np.asarray(_xla_conv(x, w, b), dtype=np.float32)
    atol = 1e-4 + 1.2e-2 * float(np.max(np.abs(y_ref)))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=atol)


def test_rot_patch_build_bit_exact(interpret_mode, monkeypatch):
    """The split pre-rotate patch build (_build_patch_rot over _splits,
    taken on the 128-aligned fm orientation) assembles the SAME taps as
    the plain whole-block per-tap build — forward and all three
    gradients must be bit-identical; only the copy/matmul schedule
    differs (one misaligned copy per lane shift instead of kt per
    shift; two half-block matmuls instead of one)."""
    rng = np.random.RandomState(7)
    x = _rand(rng, 2, 25, 8, 16)
    w = _rand(rng, 3, 3, 16, 16) / 12.
    b = _rand(rng, 16) * .1
    g = pconv.fm_geom(25, 8, 3, 3, 16)
    assert pconv._use_rot(g) and g.tc % 2 == 0  # split rot path active
    x2 = pconv.pack_fm(x, g)

    def loss(x2, w, b):
        y2 = pconv.conv2d_packed_fm(x2, w, b, g, True)
        return jnp.sum(jnp.abs(y2.astype(jnp.float32)))

    y_rot = pconv.conv2d_packed_fm(x2, w, b, g, True)
    g_rot = jax.grad(loss, argnums=(0, 1, 2))(x2, w, b)
    monkeypatch.setattr(pconv, '_use_rot', lambda gg: False)
    y_old = pconv.conv2d_packed_fm(x2, w, b, g, True)
    g_old = jax.grad(loss, argnums=(0, 1, 2))(x2, w, b)
    np.testing.assert_array_equal(np.asarray(y_rot), np.asarray(y_old))
    # dx / db: bit-exact (per-element contractions are unchanged); dw:
    # the split accumulates two f32 half-lane sums, so summation ORDER
    # differs -> ULP-level tolerance
    np.testing.assert_array_equal(
        np.asarray(g_rot[0], np.float32), np.asarray(g_old[0], np.float32))
    np.testing.assert_array_equal(
        np.asarray(g_rot[2], np.float32), np.asarray(g_old[2], np.float32))
    np.testing.assert_allclose(
        np.asarray(g_rot[1], np.float32), np.asarray(g_old[1], np.float32),
        rtol=1e-5, atol=1e-6)


def test_tapwise_path_matches_patch_path(interpret_mode, monkeypatch):
    """At 128-multiple channel counts the kernels take the patch-FREE
    tap-wise path (_use_taps); forward and gradients must match the
    patch path within summation-order tolerance (9 f32 partial sums vs
    one K-contraction; operands are identical bf16 values)."""
    rng = np.random.RandomState(9)
    c = 128
    x = _rand(rng, 1, 20, 4, c) / 4.
    w = _rand(rng, 3, 3, c, c) / 40.
    b = _rand(rng, c) * .1
    g = pconv.fm_geom(20, 4, 3, 3, c)
    assert pconv._use_taps(g, c)
    x2 = pconv.pack_fm(x, g)
    gy = _rand(rng, 1, 20, 4, c)

    def loss(x2, w, b):
        y2 = pconv.conv2d_packed_fm(x2, w, b, g, True)
        return jnp.sum(pconv.unpack_fm(y2, g, jnp.float32) * gy)

    y_taps = pconv.conv2d_packed_fm(x2, w, b, g, True)
    g_taps = jax.grad(loss, argnums=(0, 1, 2))(x2, w, b)
    monkeypatch.setattr(pconv, '_use_taps', lambda gg, cc: False)
    y_patch = pconv.conv2d_packed_fm(x2, w, b, g, True)
    g_patch = jax.grad(loss, argnums=(0, 1, 2))(x2, w, b)
    scale = float(np.max(np.abs(np.asarray(y_patch, np.float32))))
    np.testing.assert_allclose(
        np.asarray(y_taps, np.float32), np.asarray(y_patch, np.float32),
        atol=2e-2 * scale)
    for a, o in zip(g_taps, g_patch):
        o = np.asarray(o, np.float32)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), o,
            atol=1e-5 + 1e-3 * float(np.max(np.abs(o))))


def test_conv2d_packed_fm_gradients(interpret_mode):
    rng = np.random.RandomState(3)
    x = _rand(rng, 2, 12, 8, 16)
    w = _rand(rng, 3, 3, 16, 16) / 12.
    b = _rand(rng, 16) * .1
    g = pconv.fm_geom(12, 8, 3, 3, 16)
    gy = _rand(rng, 2, 12, 8, 16)

    def loss_packed(x, w, b):
        y2 = pconv.conv2d_packed_fm(pconv.pack_fm(x, g), w, b, g, True)
        return jnp.sum(pconv.unpack_fm(y2, g, jnp.float32) * gy)

    def loss_ref(x, w, b):
        return jnp.sum(_xla_conv(x, w, b).astype(jnp.float32) * gy)

    grads_p = jax.grad(loss_packed, argnums=(0, 1, 2))(x, w, b)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for gp, gr in zip(grads_p, grads_r):
        gr = np.asarray(gr, dtype=np.float32)
        # db: the XLA reference itself sums the cotangent in bf16
        # (visibly quantized values); the packed path's f32 db is the
        # MORE accurate one — tolerance covers the reference's noise
        atol = 1e-4 + 3.5e-2 * float(np.max(np.abs(gr)))
        np.testing.assert_allclose(
            np.asarray(gp, dtype=np.float32), gr, atol=atol)


def test_maxpool2_rows_packed_matches_nn(interpret_mode):
    rng = np.random.RandomState(4)
    x = _rand(rng, 2, 12, 16, 16)
    g = pconv.fm_geom(12, 16, 3, 3, 16)
    x2 = pconv.pack_fm(x, g)
    y2 = pconv.maxpool2_rows_packed(x2, 8, g.fs, True)
    g_out = g._replace(t=8, tp=8, ls=8 * g.fs)
    y = pconv.unpack_fm(y2, g_out, jnp.float32)
    # reference pools freq with (2, 1) in our (B, T, F, C) layout
    y_ref = nn.max_pool(x.astype(jnp.bfloat16), window_shape=(1, 2),
                        strides=(1, 2))
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(y_ref.astype(jnp.float32)))


def test_maxpool2_rows_packed_gradient(interpret_mode):
    rng = np.random.RandomState(5)
    x = _rand(rng, 1, 9, 8, 16)
    g = pconv.fm_geom(9, 8, 3, 3, 16)
    gy = _rand(rng, 1, 9, 4, 16)
    g_out = g._replace(t=4, tp=4, ls=4 * g.fs)

    def loss_packed(x):
        y2 = pconv.maxpool2_rows_packed(pconv.pack_fm(x, g), 4, g.fs,
                                        True)
        return jnp.sum(pconv.unpack_fm(y2, g_out, jnp.float32) * gy)

    def loss_ref(x):
        y = nn.max_pool(x.astype(jnp.bfloat16), window_shape=(1, 2),
                        strides=(1, 2))
        return jnp.sum(y.astype(jnp.float32) * gy)

    gp = jax.grad(loss_packed)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-5)


def test_avgpool2_rows_packed_matches_mean(interpret_mode):
    """Bit-exact vs the reshape(b,c,rows/2,2,ts).mean(3) spelling it
    replaces in cnn.py:_match_residual_packed (f32 adds, exact halve)."""
    rng = np.random.RandomState(7)
    x = _rand(rng, 2, 12, 16, 16)
    g = pconv.fm_geom(12, 16, 3, 3, 16)
    x2 = pconv.pack_fm(x, g)          # bf16 packed, rows=16
    y2 = pconv.avgpool2_rows_packed(x2, 8, g.fs, True)
    assert y2.dtype == jnp.float32
    b, c = x2.shape[:2]
    ref = x2.astype(jnp.float32).reshape(
        b, c, 8, 2, g.fs).mean(3).reshape(b, c, 8 * g.fs)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(ref))
    # chained halvings stay exact on the f32 intermediate
    y4 = pconv.avgpool2_rows_packed(y2, 4, g.fs, True)
    ref4 = ref.reshape(b, c, 4, 2, g.fs).mean(3).reshape(
        b, c, 4 * g.fs)
    np.testing.assert_array_equal(np.asarray(y4), np.asarray(ref4))


def test_avgpool2_rows_packed_gradient(interpret_mode):
    """The custom VJP routes gy/2 to both rows, cast to the primal
    dtype — identical to the astype/reshape/mean chain's cotangent."""
    rng = np.random.RandomState(8)
    x = _rand(rng, 1, 9, 8, 16)
    g = pconv.fm_geom(9, 8, 3, 3, 16)
    x2 = pconv.pack_fm(x, g)          # bf16 packed, rows=8
    gy = _rand(rng, *x2.shape[:2], 4 * g.fs)

    def loss_kernel(x2):
        return jnp.sum(pconv.avgpool2_rows_packed(x2, 4, g.fs, True)
                       * gy)

    def loss_ref(x2):
        b, c = x2.shape[:2]
        y = x2.astype(jnp.float32).reshape(
            b, c, 4, 2, g.fs).mean(3).reshape(b, c, 4 * g.fs)
        return jnp.sum(y * gy)

    gk = jax.grad(loss_kernel)(x2)
    gr = jax.grad(loss_ref)(x2)
    assert gk.dtype == x2.dtype
    np.testing.assert_array_equal(
        np.asarray(gk, dtype=np.float32),
        np.asarray(gr, dtype=np.float32))


def test_conv2d_mxu_drop_in_time_major(interpret_mode):
    """The (B, T, F, C) drop-in wrapper (time-major orientation)."""
    from pb_sed_tpu.ops.pallas.conv import conv2d_mxu
    rng = np.random.RandomState(6)
    x = _rand(rng, 2, 18, 10, 16)
    w = _rand(rng, 3, 3, 16, 16) / 12.
    b = _rand(rng, 16) * .1
    y = conv2d_mxu(x, w, b, True)
    y_ref = np.asarray(_xla_conv(x, w, b).astype(jnp.float32))
    atol = 1e-4 + 1.2e-2 * float(np.max(np.abs(y_ref)))
    np.testing.assert_allclose(
        np.asarray(y.astype(jnp.float32)), y_ref, atol=atol)


def _mini_tower(use_pallas, pre_activation=True, output_layer=False,
                residuals=None, dropout=0., pools=None, fuse_bn=False):
    from pb_sed_tpu.ops.cnn import CNN2d
    return CNN2d(
        out_channels=[16, 16, 32, 32],
        kernel_size=3,
        pool_size=pools if pools is not None else [1, [2, 1], 1, [2, 1]],
        residual_connections=residuals,
        norm='batch', norm_kwargs={'eps': 1e-3},
        activation_fn='relu', pre_activation=pre_activation,
        dropout=dropout, output_layer=output_layer,
        use_pallas=use_pallas, fuse_bn=fuse_bn)


def _tower_data(seed=7, b=2, t=20, f=16, c=1):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, f, c).astype(np.float32))
    seq_len = jnp.asarray([t, t - 6][:b])
    return x, seq_len


@pytest.mark.parametrize('pre_activation', [True, False])
def test_cnn2d_packed_tower_parity(interpret_mode, pre_activation):
    """The packed tower (pack once, packed BN/act/conv/pool chain)
    must match the unpacked XLA tower: outputs, gradients, and batch
    statistics — with the SAME parameter tree."""
    x, seq_len = _tower_data()
    ref = _mini_tower(False, pre_activation)
    packed = _mini_tower(True, pre_activation)
    variables = ref.init(jax.random.PRNGKey(0), x, seq_len,
                         training=True)
    # the plan must actually select the packed path: layer 0 (cin=1)
    # packs via the channel-padded ENTRY (entry_pad)
    plan = packed._packed_plan(
        x, [3] * 4, [1, [2, 1], 1, [2, 1]], [None] * 4)
    assert plan is not None and plan[:2] == (0, 4) and plan[4] is True

    (y_ref, sl_ref), stats_ref = ref.apply(
        variables, x, seq_len, training=True, mutable=['batch_stats'])
    (y_p, sl_p), stats_p = packed.apply(
        variables, x, seq_len, training=True, mutable=['batch_stats'])
    assert int(sl_p[0]) == int(sl_ref[0])
    atol = 1e-4 + 2e-2 * float(np.max(np.abs(np.asarray(y_ref))))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               atol=atol)
    ref_stats = jax.tree_util.tree_leaves(stats_ref)
    p_stats = jax.tree_util.tree_leaves(stats_p)
    for a, b_ in zip(p_stats, ref_stats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-2)
    # eval mode (running stats path)
    merged = {'params': variables['params'], **stats_ref}
    y_ref_e, _ = ref.apply(merged, x, seq_len, training=False)
    y_p_e, _ = packed.apply(merged, x, seq_len, training=False)
    atol = 1e-4 + 2e-2 * float(np.max(np.abs(np.asarray(y_ref_e))))
    np.testing.assert_allclose(np.asarray(y_p_e), np.asarray(y_ref_e),
                               atol=atol)


def test_cnn2d_packed_tower_gradients(interpret_mode):
    """Pool-free tower: max pools pick SUBGRADIENTS at bf16 near-ties,
    and the packed conv's different (correct) f32 accumulation order
    flips an occasional argmax vs the XLA path — routing O(100)
    cotangents to the other freq bin. Pool gradient routing itself is
    pinned exactly by test_maxpool2_rows_packed_gradient; here the
    BN/act/mask/conv chain is compared tie-free."""
    x, seq_len = _tower_data(seed=8)
    ref = _mini_tower(False, pools=[1] * 4)
    packed = _mini_tower(True, pools=[1] * 4)
    variables = ref.init(jax.random.PRNGKey(1), x, seq_len,
                         training=True)

    def loss(model, params):
        (y, _), _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            x, seq_len, training=True, mutable=['batch_stats'])
        return jnp.sum(jnp.square(y))

    g_ref = jax.grad(lambda p: loss(ref, p))(variables['params'])
    g_p = jax.grad(lambda p: loss(packed, p))(variables['params'])
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = jax.tree_util.tree_leaves(g_p)
    # bf16 noise floor is set by the LARGE gradients flowing through a
    # leaf's layer, not the leaf's own magnitude: a conv bias followed
    # by batch norm has a near-cancelling gradient (BN is invariant to
    # input shifts over its stats mask — only padded frames survive),
    # so its |grad| is ~1000x below the kernel's while its absolute
    # noise is the same scale. Tolerance = 3% per leaf + global floor.
    # Conv BIAS gradients: a conv followed by batch norm has an
    # EXACTLY cancelling bias gradient (BN output is invariant to a
    # constant input shift — the masked mean absorbs it at valid AND
    # padded positions), so the true db ~= 0. The packed path's f32 db
    # lands there; the CPU XLA reference's does NOT — its bf16 serial
    # reduction of the cancelling cotangent random-walks to +-50 —
    # so for those leaves the REFERENCE is the noisy one and the
    # packed value is checked against the analytic zero instead.
    params = variables['params']
    n_last = max(int(k.split('_')[1]) for k in params if
                 k.startswith('conv_'))
    gmax = max(float(np.max(np.abs(np.asarray(g, np.float32))))
               for _, g in flat_r)
    for (path, gr), gp in zip(flat_r, flat_p):
        gr = np.asarray(gr, dtype=np.float32)
        gp = np.asarray(gp, dtype=np.float32)
        layer = str(path[0].key)
        leaf = str(path[1].key)
        if leaf == 'bias' and layer.startswith('conv_') \
                and layer != f'conv_{n_last}':
            if layer == 'conv_0':
                # prefix layer: BOTH paths compute this bias grad via
                # XLA's bf16 reduction (different orders) — two noise
                # samples of the analytic zero; nothing to compare
                continue
            wmax = float(np.max(np.abs(np.asarray(
                g_p[layer]['kernel'], np.float32))))
            assert float(np.max(np.abs(gp))) < 1e-2 * wmax + 1e-3, path
            continue
        # 8%: the reference re-quantizes the cotangent to bf16 at every
        # chained conv VJP in a different accumulation order
        atol = 1e-3 + 8e-2 * float(np.max(np.abs(gr))) + 2e-3 * gmax
        np.testing.assert_allclose(gp, gr, atol=atol, err_msg=str(path))


def test_bnrelu_conv2d_packed_fm_matches_composition(interpret_mode):
    """The BN+ReLU fused conv (forward and EVERY gradient) must match
    the two-op composition ``mask * relu(x * s + t) ->
    conv2d_packed_fm`` it replaces, on all three kernel paths: rot
    (cin < 128), taps (cin == 128) and channel-blocked (cin == 256,
    which also exercises the cout == 128-split-free cb backward)."""
    shapes = [
        (2, 20, 16, 16, 32),     # rot path
        (1, 12, 8, 128, 128),    # taps path
        (1, 8, 4, 256, 256),     # channel-blocked path
    ]
    for seed, (b_, t, f, cin, cout) in enumerate(shapes):
        rng = np.random.RandomState(20 + seed)
        x = _rand(rng, b_, t, f, cin)
        w = _rand(rng, 3, 3, cin, cout) / (3. * np.sqrt(cin))
        b = _rand(rng, cout) * .1
        sc = jnp.asarray(.5 + rng.rand(cin).astype(np.float32))
        sh = _rand(rng, cin) * .2
        g = pconv.fm_geom(t, f, 3, 3, max(cin, cout), cin=cin,
                          cout=cout, fused=True)
        x2 = pconv.pack_fm(x, g)
        struct = pconv.lane_mask(g, jnp.float32)
        # cotangent with nonzero structural lanes (the production
        # cotangent has them: the next layer's taps read those slots)
        gy = _rand(rng, b_, cout, g.ls)

        def a_of(x2_, sc_, sh_):
            return (jnp.maximum(
                x2_.astype(jnp.float32) * sc_.reshape(1, -1, 1)
                + sh_.reshape(1, -1, 1), 0.) * struct
            ).astype(jnp.bfloat16)

        def f_ref(x2_, sc_, sh_, w_, b_):
            y = pconv.conv2d_packed_fm(a_of(x2_, sc_, sh_), w_, b_, g,
                                       True)
            return jnp.sum(y.astype(jnp.float32) * gy)

        def f_fused(x2_, sc_, sh_, w_, b_):
            y = pconv.bnrelu_conv2d_packed_fm(x2_, sc_, sh_, w_, b_, g,
                                              True)
            return jnp.sum(y.astype(jnp.float32) * gy)

        y_f = pconv.bnrelu_conv2d_packed_fm(x2, sc, sh, w, b, g, True)
        y_r = pconv.conv2d_packed_fm(a_of(x2, sc, sh), w, b, g, True)
        ymax = float(np.max(np.abs(np.asarray(y_r, np.float32))))
        np.testing.assert_allclose(
            np.asarray(y_f, np.float32), np.asarray(y_r, np.float32),
            atol=1e-4 + 2e-3 * ymax, err_msg=f'fwd shape {seed}')
        # the fused output is itself structurally masked
        np.testing.assert_array_equal(
            np.asarray(y_f * struct), np.asarray(y_f))

        g_r = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x2, sc, sh, w, b)
        g_f = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(
            x2, sc, sh, w, b)
        for name, gf_, gr_ in zip(('dx', 'dscale', 'dshift', 'dw',
                                   'db'), g_f, g_r):
            gf_ = np.asarray(gf_, np.float32)
            gr_ = np.asarray(gr_, np.float32)
            scale = max(1e-6, float(np.max(np.abs(gr_))))
            err = float(np.max(np.abs(gf_ - gr_))) / scale
            assert err < 2e-2, (seed, name, err)


def test_cnn2d_fuse_bn_matches_unfused(interpret_mode):
    """fuse_bn=True must reproduce the packed tower bit-for-tolerance:
    same param/variable tree, same statistics updates, matching
    outputs and parameter gradients (the only numeric difference is
    the affine association (x - m) * s vs x * s + (b - m * s))."""
    x, seq_len = _tower_data()
    base = _mini_tower(True)
    fused = _mini_tower(True, fuse_bn=True)
    plan = fused._packed_plan(
        x, [3] * 4, [1, [2, 1], 1, [2, 1]], [None] * 4)
    # entry (cin=1, channel-padded, BN runs unpacked) is NOT fused;
    # every other layer is
    assert plan is not None and plan[5] == frozenset({1, 2, 3}), plan
    variables = base.init(jax.random.PRNGKey(0), x, seq_len,
                          training=True)
    (y_b, sl_b), stats_b = base.apply(
        variables, x, seq_len, training=True, mutable=['batch_stats'])
    (y_f, sl_f), stats_f = fused.apply(
        variables, x, seq_len, training=True, mutable=['batch_stats'])
    assert int(sl_f[0]) == int(sl_b[0])
    atol = 1e-4 + 2e-2 * float(np.max(np.abs(np.asarray(y_b))))
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_b),
                               atol=atol)
    for a, b_ in zip(jax.tree_util.tree_leaves(stats_f),
                     jax.tree_util.tree_leaves(stats_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3 + 1e-2 * float(
                                       np.max(np.abs(np.asarray(b_)))))
    # eval mode (running-stats fold)
    merged = {'params': variables['params'], **stats_b}
    y_b_e, _ = base.apply(merged, x, seq_len, training=False)
    y_f_e, _ = fused.apply(merged, x, seq_len, training=False)
    atol = 1e-4 + 2e-2 * float(np.max(np.abs(np.asarray(y_b_e))))
    np.testing.assert_allclose(np.asarray(y_f_e), np.asarray(y_b_e),
                               atol=atol)

    # parameter gradients (pool-free: see
    # test_cnn2d_packed_tower_gradients for why pools are excluded)
    base_np = _mini_tower(True, pools=[1] * 4)
    fused_np = _mini_tower(True, pools=[1] * 4, fuse_bn=True)
    variables = base_np.init(jax.random.PRNGKey(1), x, seq_len,
                             training=True)

    def loss(model, params):
        (y, _), _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            x, seq_len, training=True, mutable=['batch_stats'])
        return jnp.sum(jnp.square(y))

    g_b = jax.grad(lambda p: loss(base_np, p))(variables['params'])
    g_f = jax.grad(lambda p: loss(fused_np, p))(variables['params'])
    gmax = max(float(np.max(np.abs(np.asarray(g, np.float32))))
               for g in jax.tree_util.tree_leaves(g_b))
    for (path, gb_), gf_ in zip(
            jax.tree_util.tree_leaves_with_path(g_b),
            jax.tree_util.tree_leaves(g_f)):
        gb_ = np.asarray(gb_, np.float32)
        gf_ = np.asarray(gf_, np.float32)
        atol = 1e-3 + 5e-2 * float(np.max(np.abs(gb_))) + 2e-3 * gmax
        np.testing.assert_allclose(gf_, gb_, atol=atol,
                                   err_msg=str(path))


def _deep_mini_tower(use_pallas, pools=None, residuals='default'):
    """Tiny analog of the reference 'deep' net_config: alternating
    3x3 / 1x1 kernels, i -> i+2 residual skips across a channel-growth
    + freq-pool boundary (reference training.py:158-185)."""
    from pb_sed_tpu.ops.cnn import CNN2d
    if residuals == 'default':
        residuals = [None, None, 4, None, None, None]
    return CNN2d(
        out_channels=[16, 16, 16, 16, 32, 32],
        kernel_size=[3, 1, 3, 1, 3, 1],
        pool_size=pools if pools is not None
        else [1, 1, [2, 1], 1, 1, 1],
        residual_connections=residuals,
        norm='batch', norm_kwargs={'eps': 1e-3},
        activation_fn='relu', pre_activation=True,
        dropout=0., output_layer=False, use_pallas=use_pallas)


def test_cnn2d_packed_deep_tower_parity(interpret_mode):
    """Deep-config features on the packed layout: 1x1 convs (masked
    packed matmul), residual skips crossing a pool + channel-growth
    boundary (packed row avg-pool + channel zero-pad), all inside one
    packed window — outputs and seq_len must match the unpacked XLA
    tower with the SAME parameter tree."""
    x, seq_len = _tower_data(seed=13, t=24, f=8)
    ref = _deep_mini_tower(False)
    packed = _deep_mini_tower(True)
    variables = ref.init(jax.random.PRNGKey(3), x, seq_len,
                         training=True)
    plan = packed._packed_plan(
        x, [3, 1, 3, 1, 3, 1], [1, 1, [2, 1], 1, 1, 1],
        [None, None, 4, None, None, None])
    assert plan is not None and plan[:2] == (0, 6)
    for training in (True, False):
        if training:
            (y_ref, sl_ref), _ = ref.apply(
                variables, x, seq_len, training=True,
                mutable=['batch_stats'])
            (y_p, sl_p), _ = packed.apply(
                variables, x, seq_len, training=True,
                mutable=['batch_stats'])
        else:
            y_ref, sl_ref = ref.apply(variables, x, seq_len,
                                      training=False)
            y_p, sl_p = packed.apply(variables, x, seq_len,
                                     training=False)
        assert y_p.shape == y_ref.shape
        np.testing.assert_array_equal(np.asarray(sl_p),
                                      np.asarray(sl_ref))
        atol = 1e-4 + 2e-2 * float(np.max(np.abs(np.asarray(y_ref))))
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                                   atol=atol)


def test_cnn2d_packed_deep_tower_gradients(interpret_mode):
    """Gradient parity of the deep-config packed tower (pool-free to
    avoid max-pool argmax flips at bf16 near-ties; conv-bias-before-BN
    leaves carry an analytically-zero gradient drowned in bf16 noise —
    same handling as test_cnn2d_packed_tower_gradients)."""
    x, seq_len = _tower_data(seed=14, t=24, f=8)
    ref = _deep_mini_tower(False, pools=[1] * 6)
    packed = _deep_mini_tower(True, pools=[1] * 6)
    variables = ref.init(jax.random.PRNGKey(4), x, seq_len,
                         training=True)

    def loss(model, params):
        (y, _), _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            x, seq_len, training=True, mutable=['batch_stats'])
        return jnp.sum(jnp.square(y))

    g_ref = jax.grad(lambda p: loss(ref, p))(variables['params'])
    g_p = jax.grad(lambda p: loss(packed, p))(variables['params'])
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = jax.tree_util.tree_leaves(g_p)
    gmax = max(float(np.max(np.abs(np.asarray(g, np.float32))))
               for _, g in flat_r)
    for (path, gr), gp in zip(flat_r, flat_p):
        gr = np.asarray(gr, dtype=np.float32)
        gp = np.asarray(gp, dtype=np.float32)
        layer = str(path[0].key)
        leaf = str(path[1].key)
        if leaf == 'bias' and layer.startswith('conv_') \
                and layer != 'conv_5':
            wmax = float(np.max(np.abs(np.asarray(
                g_p[layer]['kernel'], np.float32))))
            assert float(np.max(np.abs(gp))) < 2e-2 * wmax + 1e-3, path
            continue
        atol = 1e-3 + 8e-2 * float(np.max(np.abs(gr))) + 2e-3 * gmax
        np.testing.assert_allclose(gp, gr, atol=atol, err_msg=str(path))


def test_packed_window_boundary_residuals(interpret_mode):
    """Residual skips CROSSING a packed-window boundary convert at the
    use site: an unpacked-prefix save added at a packed layer (u -> p)
    and a packed save added at an unpacked-tail layer (p -> u). The
    window is forced by unpackable layers (even kernels) at the tower
    ends."""
    from pb_sed_tpu.ops.cnn import CNN2d
    kernels = [2, 3, 3, 3, 2]
    pools = [1, 1, [2, 1], 1, 1]
    residuals = [2, None, 4, None, None]
    cfg = dict(out_channels=[16, 16, 16, 32, 32],
               kernel_size=kernels, pool_size=pools,
               residual_connections=residuals, norm='batch',
               norm_kwargs={'eps': 1e-3}, activation_fn='relu',
               pre_activation=True, dropout=0., output_layer=False)
    x, seq_len = _tower_data(seed=15, t=24, f=8, c=1)
    ref = CNN2d(**cfg, use_pallas=False)
    packed = CNN2d(**cfg, use_pallas=True)
    plan = packed._packed_plan(x, kernels, pools, residuals)
    assert plan is not None and plan[:2] == (1, 4)
    variables = ref.init(jax.random.PRNGKey(5), x, seq_len,
                         training=True)
    (y_ref, sl_ref), _ = ref.apply(variables, x, seq_len,
                                   training=True,
                                   mutable=['batch_stats'])
    (y_p, sl_p), _ = packed.apply(variables, x, seq_len,
                                  training=True,
                                  mutable=['batch_stats'])
    np.testing.assert_array_equal(np.asarray(sl_p), np.asarray(sl_ref))
    atol = 1e-4 + 2e-2 * float(np.max(np.abs(np.asarray(y_ref))))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               atol=atol)


def test_bwd_block_override_matches_default(interpret_mode):
    """A ConvGeom with a backward-specific row block (tcb != tc) must
    produce the same gradients as the default block: dx bit-equal
    (identical per-element contractions), dw within f32 summation-order
    noise (ADVICE r3: the tcb mechanism needs a pinned test)."""
    rng = np.random.RandomState(16)
    x = _rand(rng, 2, 20, 8, 16)
    w = _rand(rng, 3, 3, 16, 16) / 12.
    g0 = pconv.fm_geom(20, 8, 3, 3, 16)
    assert g0.tc in (4, 8) and g0.t % g0.tc == 0
    x2 = pconv.pack_fm(x, g0)
    gm = pconv.pack_fm(_rand(rng, 2, 20, 8, 16), g0)
    dx_a, dw_a = pconv._bwd_fused(x2, gm, w, g0, True)
    g1 = g0._replace(tcb=g0.tc // 2)
    dx_b, dw_b = pconv._bwd_fused(x2, gm, w, g1, True)
    np.testing.assert_array_equal(np.asarray(dx_a, np.float32),
                                  np.asarray(dx_b, np.float32))
    np.testing.assert_allclose(np.asarray(dw_a), np.asarray(dw_b),
                               rtol=1e-5, atol=1e-5)


def test_c128_split_backward_matches_fused(interpret_mode,
                                           monkeypatch):
    """The cout == 128 split backward (``_cb_bwd_of`` admitting
    cb=128 / nc=1 — the deep-L10 regime where the fused kernel is
    3.5x superadditive, scripts/perf/conv_c128_split_probe.py) must
    match the fused kernel: dx bit-equal (identical per-element
    contractions, measured bit-exact on v5e too), dw within f32
    summation-order noise. The gate keys on ls >= 16384 which no
    CPU-sized fixture reaches, so the split arm is forced by patching
    the gate — exactly the production code path, just engaged at a
    small shape."""
    rng = np.random.RandomState(23)
    cin = cout = 128
    x = _rand(rng, 2, 12, 8, cin) * .3
    w = _rand(rng, 3, 3, cin, cout) / (3. * np.sqrt(cin))
    g = pconv.fm_geom(12, 8, 3, 3, max(cin, cout), cin=cin, cout=cout)
    assert pconv._cb_bwd_of(cin, cout, g.ls) == 0  # small ls: fused
    x2 = pconv.pack_fm(x, g)
    gm = pconv.pack_fm(_rand(rng, 2, 12, 8, cout), g) \
        * pconv.lane_mask(g, jnp.bfloat16)
    dx_f, dw_f = pconv._bwd_fused(x2, gm, w, g, True)
    monkeypatch.setattr(
        pconv, '_cb_bwd_of',
        lambda ci, co, ls: 128 if co == 128 else pconv._cb_of(co))
    dx_s, dw_s = pconv._bwd_fused(x2, gm, w, g, True)
    np.testing.assert_array_equal(np.asarray(dx_s, np.float32),
                                  np.asarray(dx_f, np.float32))
    np.testing.assert_allclose(np.asarray(dw_s), np.asarray(dw_f),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('cin,cout', [(256, 256), (256, 512),
                                      (128, 256)])
def test_channel_blocked_taps_matches_xla(interpret_mode, cin, cout):
    """The channel-blocked tap-wise kernels (Cin/Cout >= 256: grid
    gains a 128-channel axis, f32 accumulation across channel blocks —
    the big-channel deep-tower layers) match the XLA conv path in
    forward AND gradients. These channel counts previously ran tc=1
    blocks (256->256) or fell back to XLA entirely (256->512)."""
    rng = np.random.RandomState(21)
    t, f = 12, 8
    x = _rand(rng, 2, t, f, cin) * .3
    w = _rand(rng, 3, 3, cin, cout) / (3. * np.sqrt(cin))
    b = _rand(rng, cout) * .1
    g = pconv.fm_geom(t, f, 3, 3, max(cin, cout), cin=cin, cout=cout)
    # the blocked path must actually engage on both directions it
    # applies to (fwd: cin, bwd: cout)
    assert pconv._cb_of(cin) or pconv._cb_of(cout)
    gy = _rand(rng, 2, t, f, cout)

    def loss_packed(x, w, b):
        y2 = pconv.conv2d_packed_fm(pconv.pack_fm(x, g), w, b, g, True)
        return jnp.sum(pconv.unpack_fm(y2, g, jnp.float32) * gy)

    def loss_ref(x, w, b):
        return jnp.sum(_xla_conv(x, w, b).astype(jnp.float32) * gy)

    y_p = pconv.unpack_fm(
        pconv.conv2d_packed_fm(pconv.pack_fm(x, g), w, b, g, True), g,
        jnp.float32)
    y_r = np.asarray(_xla_conv(x, w, b), dtype=np.float32)
    atol = 1e-4 + 1.2e-2 * float(np.max(np.abs(y_r)))
    np.testing.assert_allclose(np.asarray(y_p), y_r, atol=atol)

    grads_p = jax.grad(loss_packed, argnums=(0, 1, 2))(x, w, b)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    # db: the XLA reference sums the cotangent through its bf16 bias
    # add (quantized per element); at 256+ channels the accumulated
    # reference noise needs the wider bound — the packed f32 db is the
    # more accurate side (same caveat as
    # test_conv2d_packed_fm_gradients)
    for gp, gr, tol in zip(grads_p, grads_r, (3.5e-2, 3.5e-2, 8e-2)):
        gr = np.asarray(gr, dtype=np.float32)
        atol = 1e-4 + tol * float(np.max(np.abs(gr)))
        np.testing.assert_allclose(
            np.asarray(gp, dtype=np.float32), gr, atol=atol)


def test_channel_blocked_chooser_admits_deep_tail():
    """The footprint model admits the deep tower's big-channel layers
    (L14 256->256, L16 256->512 — previously tc=1 / unsupported) with
    multi-row blocks, and keeps the calibrated sub-256 geometries
    unchanged."""
    g14 = pconv.fm_geom(500, 16, 3, 3, 256, cin=256, cout=256)
    assert g14.tc >= 2
    assert pconv.fm_supported(500, 8, 3, 3, 512, cin=256, cout=512)
    g16 = pconv.fm_geom(500, 8, 3, 3, 512, cin=256, cout=512)
    assert g16.tc >= 2
    # calibrated small-channel geometry unchanged by the new branch
    g7 = pconv.fm_geom(500, 16, 3, 3, 128, cin=128, cout=128)
    assert (g7.tc, g7.tcb) == (8, 4)


def test_packed_plan_gating(interpret_mode):
    """Dropout / non-batch norm fall back to the unpacked path; time
    pools bound the packed WINDOW; residuals pack (carried as packed
    buffers); 'auto' mode on CPU never packs."""
    x, seq_len = _tower_data(seed=9)
    kernels, pools = [3] * 4, [1, [2, 1], 1, [2, 1]]
    assert _mini_tower(True)._packed_plan(
        x, kernels, pools, [None] * 4) is not None
    # residuals no longer reject the plan (round-4: packed skips)
    assert _mini_tower(True, residuals=[None, 3, None, None]
                       )._packed_plan(
        x, kernels, pools, [None, 3, None, None]) is not None
    assert _mini_tower(True, dropout=.5)._packed_plan(
        x, kernels, pools, [None] * 4) is None
    # a mid-tower TIME pool starts the packed window after it...
    plan = _mini_tower(True)._packed_plan(
        x, kernels, [1, [2, 2], 1, 1], [None] * 4)
    assert plan is not None and plan[:2] == (2, 4)
    # ...and a trailing one bounds the window before it (the tail
    # layer runs the unpacked XLA path)
    plan = _mini_tower(True)._packed_plan(
        x, kernels, [1, 1, 1, [2, 2]], [None] * 4)
    assert plan is not None and plan[:2] == (0, 3)
    # 'auto' on CPU: bit-exact fallback (kernels would drift in bf16)
    rnn_mod.set_pallas_mode('auto')
    ref = _mini_tower(False)
    variables = ref.init(jax.random.PRNGKey(2), x, seq_len,
                         training=True)
    (y_ref, _), _ = ref.apply(variables, x, seq_len, training=True,
                              mutable=['batch_stats'])
    (y_auto, _), _ = _mini_tower(True).apply(
        variables, x, seq_len, training=True, mutable=['batch_stats'])
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_ref))


def test_fbcrnn_packed_tower_wiring(interpret_mode):
    """The flagship config path: ``net_configs.cnn_config`` ships
    ``use_pallas=True`` for cnn_2d, so the FULL weak-label CRNN forward
    must route a qualifying tower through the packed plan and match the
    unpacked build with the SAME variables (checkpoint compatibility)."""
    from pb_sed_tpu.models import weak_label

    def build(use_pallas):
        return weak_label.CRNN.from_config(weak_label.CRNN.get_config({
            'feature_extractor': {
                'sample_rate': 16000, 'stft_size': 512,
                'number_of_filters': 16,
            },
            'cnn': {
                'cnn_2d': {
                    'out_channels': [16, 16, 16],
                    'kernel_size': 3,
                    'pool_size': [1, [2, 1], [2, 1]],
                    'norm': 'batch', 'norm_kwargs': {'eps': 1e-3},
                    'pre_activation': True,
                    'use_pallas': use_pallas,
                },
                'cnn_1d': {'out_channels': [16], 'kernel_size': 3,
                           'norm': 'batch', 'pre_activation': True},
            },
            'rnn_fwd': {
                'rnn': {'hidden_size': 16, 'num_layers': 1},
                'output_net': {'out_channels': [16, 10],
                               'kernel_size': 1},
            },
        }))

    ref = build(False)
    packed = build(True)
    from pb_sed_tpu.ops.cnn import CNN2d
    rng = np.random.RandomState(12)
    batch = {
        'stft': np.abs(rng.randn(2, 24, 257, 2)).astype(np.float32),
        'seq_len': np.array([24, 18], np.int32),
        'weak_targets': np.zeros((2, 10), np.float32),
        'boundary_targets': np.zeros((2, 10, 24), np.float32),
    }
    ref.init_variables(batch, seed=0)
    y_ref, y_bwd_ref, sl_ref, *_ = ref.module.apply(
        ref.variables, batch, training=False)
    y_p, y_bwd_p, sl_p, *_ = packed.module.apply(
        ref.variables, batch, training=False)
    assert np.array_equal(np.asarray(sl_p), np.asarray(sl_ref))
    for a, b in ((y_p, y_ref), (y_bwd_p, y_bwd_ref)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        atol = 1e-4 + 3e-2 * float(np.max(np.abs(b)))
        np.testing.assert_allclose(a, b, atol=atol)
    # and it was genuinely the packed path, not the fallback: the plan
    # for the post-extractor geometry must select a packed suffix —
    # from layer 0 via the channel-padded entry
    x = jnp.zeros((2, 24, 16, 1))
    plan = CNN2d(
        out_channels=[16, 16, 16], kernel_size=3,
        pool_size=[1, [2, 1], [2, 1]], residual_connections=None,
        norm='batch', norm_kwargs={'eps': 1e-3}, pre_activation=True,
        use_pallas=True)._packed_plan(
            x, [3] * 3, [1, [2, 1], [2, 1]], [None] * 3)
    assert plan is not None and plan[0] == 0 and plan[4] is True


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='needs a real TPU (run via bench.py)')
def test_conv_cblock_grad_parity_tpu():
    """Channel-blocked (cb=128) fwd + gradients vs the XLA conv ON
    HARDWARE. The blocked dw kernel accumulates (+=) into an output
    block revisited non-consecutively across (example, row-block) —
    correctness rests on Pallas-TPU revisited-output read-modify-write
    semantics, which interpret-mode CI cannot certify; a jax/Mosaic
    upgrade changing them would silently corrupt dw (ADVICE r4). This
    catches that on the chip."""
    rng = np.random.RandomState(11)
    b_, t, f, cin, cout = 2, 120, 8, 256, 256
    x = _rand(rng, b_, t, f, cin)
    w = _rand(rng, 3, 3, cin, cout) / (3. * np.sqrt(cin))
    b = _rand(rng, cout) * .1
    assert pconv._cb_of(max(cin, cout)) == 128  # path engages
    assert pconv.fm_supported(t, f, 3, 3, max(cin, cout),
                              cin=cin, cout=cout)
    g = pconv.fm_geom(t, f, 3, 3, max(cin, cout), cin=cin, cout=cout)
    x2 = pconv.pack_fm(x, g)
    gy = _rand(rng, b_, t, f, cout)

    @jax.jit
    def fg_packed(x2_, w_, b_):
        def loss(a, ww, bb):
            y2 = pconv.conv2d_packed_fm(a, ww, bb, g)
            y = pconv.unpack_fm(y2, g, jnp.float32)
            return jnp.sum(y * gy)
        return jax.grad(loss, argnums=(0, 1, 2))(x2_, w_, b_)

    @jax.jit
    def fg_xla(x_, w_, b_):
        def loss(a, ww, bb):
            return jnp.sum(_xla_conv(a, ww, bb).astype(jnp.float32)
                           * gy)
        return jax.grad(loss, argnums=(0, 1, 2))(x_, w_, b_)

    dx2, dw_p, db_p = fg_packed(x2, w, b)
    dx_p = pconv.unpack_fm(dx2, g, jnp.float32)
    dx_r, dw_r, db_r = fg_xla(x, w, b)
    for a, r, name in ((dx_p, dx_r, 'dx'), (dw_p, dw_r, 'dw'),
                       (db_p, db_r, 'db')):
        a, r = np.asarray(a, np.float32), np.asarray(r, np.float32)
        scale = max(1e-6, float(np.max(np.abs(r))))
        err = float(np.max(np.abs(a - r))) / scale
        assert err < 3e-2, (name, err)


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='needs a real TPU (run via bench.py)')
def test_conv_c128_split_grad_parity_tpu():
    """cout == 128 split backward (``_cb_bwd_of``: cin >= 128,
    ls >= 16384 — the deep-L10 regime) fwd + gradients vs the XLA conv
    ON HARDWARE. Like the cb=128 blocked path, the split dw kernel
    accumulates into an output block revisited non-consecutively
    across (example, row-block); Mosaic RMW semantics are certified on
    the chip, not in interpret mode. t=120/f=128 reaches ls=16384 so
    the gate engages naturally (asserted)."""
    rng = np.random.RandomState(12)
    b_, t, f, cin, cout = 2, 120, 128, 128, 128
    x = _rand(rng, b_, t, f, cin)
    w = _rand(rng, 3, 3, cin, cout) / (3. * np.sqrt(cin))
    b = _rand(rng, cout) * .1
    g = pconv.fm_geom(t, f, 3, 3, max(cin, cout), cin=cin, cout=cout)
    assert pconv._cb_bwd_of(cin, cout, g.ls) == 128  # split engages
    assert pconv.fm_supported(t, f, 3, 3, max(cin, cout),
                              cin=cin, cout=cout)
    x2 = pconv.pack_fm(x, g)
    gy = _rand(rng, b_, t, f, cout)

    @jax.jit
    def fg_packed(x2_, w_, b_):
        def loss(a, ww, bb):
            y2 = pconv.conv2d_packed_fm(a, ww, bb, g)
            y = pconv.unpack_fm(y2, g, jnp.float32)
            return jnp.sum(y * gy)
        return jax.grad(loss, argnums=(0, 1, 2))(x2_, w_, b_)

    @jax.jit
    def fg_xla(x_, w_, b_):
        def loss(a, ww, bb):
            return jnp.sum(_xla_conv(a, ww, bb).astype(jnp.float32)
                           * gy)
        return jax.grad(loss, argnums=(0, 1, 2))(x_, w_, b_)

    dx2, dw_p, db_p = fg_packed(x2, w, b)
    dx_p = pconv.unpack_fm(dx2, g, jnp.float32)
    dx_r, dw_r, db_r = fg_xla(x, w, b)
    for a, r, name in ((dx_p, dx_r, 'dx'), (dw_p, dw_r, 'dw'),
                       (db_p, db_r, 'db')):
        a, r = np.asarray(a, np.float32), np.asarray(r, np.float32)
        scale = max(1e-6, float(np.max(np.abs(r))))
        err = float(np.max(np.abs(a - r))) / scale
        assert err < 3e-2, (name, err)


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='needs a real TPU (run via bench.py)')
def test_conv_packed_native_tpu():
    """Non-interpret compile + parity of the packed tower on the chip."""
    x, seq_len = _tower_data(seed=10, b=2, t=40, f=32)
    ref = _mini_tower(False)
    packed = _mini_tower(True)
    variables = ref.init(jax.random.PRNGKey(3), x, seq_len,
                         training=True)
    (y_ref, _), _ = ref.apply(variables, x, seq_len, training=True,
                              mutable=['batch_stats'])
    (y_p, _), _ = packed.apply(variables, x, seq_len, training=True,
                               mutable=['batch_stats'])
    atol = 1e-4 + 2e-2 * float(np.max(np.abs(np.asarray(y_ref))))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               atol=atol)
