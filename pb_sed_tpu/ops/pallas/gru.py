"""Pallas TPU kernel for the GRU recurrence.

The GRU is the one sequential op in the model (SURVEY.md §7 "hard
parts"): ``lax.scan`` pays per-timestep loop overhead and keeps the
hidden state bouncing through HBM. This kernel time-blocks the
recurrence: the grid walks (direction, batch-block, time-block); per
step one (B_blk, T_blk, 3H) slab of precomputed input projections is
DMA'd into VMEM (double-buffered by the pallas pipeline) while the
recurrent weights and the carried hidden state stay pinned in VMEM
scratch, and the gate nonlinearities fuse into the recurrent matmul:

    for t in block:
        gates = xw[t] + h @ w_hh + b_hh        # MXU + VPU, in VMEM
        r, z = sigmoid(gates_r, gates_z); n = tanh(gates_n + r * hw_n)
        h = (1 - z) * n + z * h
        y[t] = h

VMEM budget per grid step (defaults B_blk=32, T_blk=64, H=256):
xw 6.3 MB + y 2.1 MB + w_hh 0.8 MB + state < 0.1 MB — comfortably
inside the ~16 MB budget, independent of T.

``gru_scan(xw, w_hh, b_hh, h0)`` carries a leading DIRECTION axis so the
fused bidirectional layer runs both directions in one kernel launch; it
matches the ``lax.scan`` path in ops/rnn.py (same torch gate ordering)
within MXU f32 accumulation drift, and ``StackedGRU(use_pallas=True)``
selects it. Training runs a SECOND hand-written Pallas kernel as the
``jax.custom_vjp`` backward (:func:`_gru_scan_pallas_bwd`): a reverse
time-blocked sweep that recomputes the gates from the saved outputs —
so a full training step spends TWO kernel launches per GRU instead of
~2 x T x ~15 scan ops. Measured on v5e at flagship size (trace-timed
device spans): forward 0.43 ms vs 0.50 ms scan; forward+grad 2.17 ms
vs 3.51 ms. Both kernels stream ONE shared (D, T, B, 3H) bf16 xw (the
forward input doubles as the backward residual) and the backward's
h_prev residual ships bf16 in the same layout; block_t=32 for the
backward still overflows scoped VMEM even with bf16 slabs (re-probed
after the diet: remote compile rejects 32 and 64 at D=2, H=256).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts (tests run CPU)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _gru_kernel(xw_ref, w_cat_ref, b_hh_ref, h0_ref, y_ref, h_scratch, *,
                t_block, hidden, d):
    """One (batch-block, time-block) grid step, BOTH directions fused.

    The direction axis is folded into the ROWS of one MXU matmul: the
    (D*B_blk, H) stacked state multiplies a (H, D*3H) direction-
    concatenated weight and each direction reads its diagonal block of
    the (D*B_blk, D*3H) product. With D=2, B_blk=32, H=256 the fat
    matmul has the SAME MXU tile count as one direction alone (rows
    stay under the 128-row tile), so the recurrence issues HALF the
    matmuls of a direction-as-grid-axis layout. Inputs to the matmul
    are bf16 (one MXU pass instead of the 3-pass f32 decomposition);
    accumulation and gate math stay f32.
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _init():
        h_scratch[:] = h0_ref[:].reshape(-1, hidden)

    w_cat = w_cat_ref[:]  # (H, D*3H) bf16

    def body(t, h_cat):  # h_cat: (D*B_blk, H) f32
        hw_cat = jnp.dot(h_cat.astype(jnp.bfloat16), w_cat,
                         preferred_element_type=jnp.float32)
        bb = h_cat.shape[0] // d
        outs = []
        for di in range(d):
            hw = (hw_cat[di * bb:(di + 1) * bb,
                         di * 3 * hidden:(di + 1) * 3 * hidden]
                  + b_hh_ref[di])
            # xw streams as bf16 (halves the dominant DMA + VMEM slab;
            # the values are bf16-matmul outputs upstream anyway) in
            # (D, T, B, 3H) layout — time must stay OFF the (8, 128)
            # tiled minor dims: a dynamic t index on a bf16 second-
            # minor dim is unlowerable (sublane pairs pack along it)
            xw_t = xw_ref[di, t, :, :].astype(jnp.float32)
            xr = xw_t[:, :hidden]
            xz = xw_t[:, hidden:2 * hidden]
            xn = xw_t[:, 2 * hidden:]
            hr = hw[:, :hidden]
            hz = hw[:, hidden:2 * hidden]
            hn = hw[:, 2 * hidden:]
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1. - z) * n + z * h_cat[di * bb:(di + 1) * bb]
            y_ref[di, :, t, :] = h_new
            outs.append(h_new)
        return jnp.concatenate(outs, axis=0)

    h_scratch[:] = jax.lax.fori_loop(0, t_block, body, h_scratch[:])


def _fwd_blocks(d, h, b):
    """(block_b, block_t) for the forward kernel vs the 16 MB
    scoped-VMEM budget. Slab bytes scale with d*h*block_b*block_t
    (bf16 xw in + f32 y out, double-buffered) plus the (h, d*3h) bf16
    weight. Anchor: (32, 32) measured to fit at D=2, H=256 (f32 xw
    overflowed by 100 KB; bf16 halves the slab). Larger hidden sizes
    shrink both blocks conservatively."""
    if h <= 256:
        return min(32, b), (32 if d * h <= 512 else 16)
    return min(16, b), 16


def _bwd_blocks(d, h, b):
    """(block_b, block_t) for the FUSED backward kernel: FIVE streamed
    slabs (~26*d*h bytes per (b, t) cell — the direction fold streams
    ALL directions per grid step) PLUS the revisited dw_hh block, which
    scales d*h*3h (h^2!) — at D=1, H=512 that block alone is 3.1 MB
    and block_t=16 overflowed scoped VMEM by 5.57 MB (measured on
    v5e). Anchors: (32, 16) fits D=1 H=256; D=2 H=256 needs (32, 8)
    (16 overflowed by 828 KB after the fold)."""
    if h <= 256:
        return min(32, b), (16 if d * h <= 256 else 8)
    # h > 256 does NOT fit the 16 MB scoped-VMEM budget in this layout:
    # (16, 8) measured 48 KB over at D=1, H=512, (8, 8) paradoxically
    # 1.12 MB over (allocator fixed structures grow non-monotonically),
    # and block_t < 8 is illegal (time is the second-minor dim, which
    # Mosaic requires 8-divisible). The SPLIT backward variant
    # (:func:`_gru_bwd_split_kernel`) therefore handles h > 256; these
    # blocks remain for explicit/forced use of the fused kernel.
    return min(16, b), 8


def _bwd_split_blocks(d, h, b):
    """(block_b, block_t) for the SPLIT backward kernel, which has NO
    revisited dw_hh block (the weight-gradient contraction runs outside
    the kernel): the footprint is six streamed slabs (~20*d*h bytes per
    (b, t) cell, double-buffered — xw/dxw bf16 3H, h_prev/r bf16 H,
    g f32 H) plus the two (h, d*3h)-class bf16 weight stacks. Dropping
    the h^2 accumulator both admits H=512 and doubles the legal
    block_t at H=256 (fewer grid steps on the sequential sweep).

    Calibration (v5e, scripts/perf/gru_bwd_block_probe.py): the real
    scoped-VMEM footprint exceeds the slabs+weights model by loop
    temporaries + Mosaic fixed structures that grow with d*h —
    measured compile/fail points:

      d*h = 512  (D=2, H=256): (32, 16) fits (~15.4 MB; the two-
                 weight-stack variant was 148 KB over, hence w_t-free)
      d*h = 512  (D=1, H=512): keyed SEPARATELY (ADVICE r4) — the
                 (h, d*3h) weight stacks scale with h, not d*h, so
                 this point carries 2x the weight bytes of D=2/H=256.
                 Probed B=32 T=501: (32, 16) fits standalone at
                 1.391 ms, (32, 8) 1.376 ms with half the slab
                 footprint (in-situ margin, PERFORMANCE.md calibration
                 discipline), (8, 8) 3.049 ms -> (32, 8).
      d*h = 1024 (D=2, H=512): (16, 16) 3 MB over, (16, 8) 1.8 MB
                 over, (8, 8) fits (2.94 ms vs scan ~4.9 ms)
    """
    dh = d * h
    if h > 256:
        # large-h rows: weight stacks dominate — see the D=1/H=512
        # calibration above; anything bigger only fits at (8, 8)
        if dh <= 512:
            return min(32, b), 8
        return min(8, b), 8
    if dh <= 512:
        return min(32, b), 16
    return min(16, b), 16


def _to_tm(xw):
    """(D, B, T, 3H) any-dtype -> (D, T, B, 3H) bf16 — the layout BOTH
    kernels stream (hoisted so forward input and backward residual are
    ONE array; the values are bf16-matmul outputs upstream anyway)."""
    return jnp.swapaxes(xw, 1, 2).astype(jnp.bfloat16)


def _gru_scan_pallas(xw, w_hh, b_hh, h0, interpret=False,
                     block_b=None, block_t=None):
    return _gru_scan_pallas_tm(_to_tm(xw), w_hh, b_hh, h0,
                               interpret=interpret, block_b=block_b,
                               block_t=block_t)


def _gru_scan_pallas_tm(xw_tm, w_hh, b_hh, h0, interpret=False,
                        block_b=None, block_t=None):
    d, t, b, three_h = xw_tm.shape
    h = three_h // 3
    auto_b, auto_t = _fwd_blocks(d, h, b)
    block_b = auto_b if block_b is None else min(block_b, b)
    block_t = auto_t if block_t is None else block_t
    block_t = min(block_t, t)
    # time must tile exactly: pad with zeros (outputs trimmed below);
    # padded steps still update h but their y is discarded and the
    # caller masks sequence ends anyway
    t_pad = (-t) % block_t
    if t_pad:
        xw_tm = jnp.pad(xw_tm, ((0, 0), (0, t_pad), (0, 0), (0, 0)))
    tt = t + t_pad
    grid = (pl.cdiv(b, block_b), tt // block_t)
    kernel = functools.partial(
        _gru_kernel, t_block=block_t, hidden=h, d=d)
    in_specs = [
        pl.BlockSpec((d, block_t, block_b, three_h),
                     lambda bi, ti: (0, ti, bi, 0)),
        pl.BlockSpec((h, d * three_h), lambda bi, ti: (0, 0)),
        pl.BlockSpec((d, 1, three_h), lambda bi, ti: (0, 0, 0)),
        pl.BlockSpec((d, block_b, h), lambda bi, ti: (0, bi, 0)),
    ]
    out_specs = pl.BlockSpec(
        (d, block_b, block_t, h), lambda bi, ti: (0, bi, ti, 0))
    if pltpu is None:  # pragma: no cover
        raise RuntimeError(
            'pallas TPU support unavailable; use StackedGRU with '
            'use_pallas=False')
    scratch = [pltpu.VMEM((d * block_b, h), jnp.float32)]
    # (D, H, 3H) -> (H, D*3H): w_cat[:, d*3H:(d+1)*3H] == w_hh[d]
    w_cat = jnp.swapaxes(w_hh, 0, 1).reshape(h, d * three_h)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((d, b, tt, h), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xw_tm,
      w_cat.astype(jnp.bfloat16),
      b_hh.reshape(d, 1, three_h).astype(jnp.float32),
      h0.astype(jnp.float32))
    return y[:, :, :t, :]


def _gru_bwd_kernel(xw_ref, hprev_ref, wcat_ref, wt_ref, b_hh_ref,
                    g_ref, dxw_ref, dwhh_ref, dbhh_ref, dh0_ref,
                    dh_scratch, *, t_block, hidden, d):
    """Reverse-sweep backward: one (batch-block, rev-time-block) grid
    step, BOTH directions fused. Recomputes the gates from xw + h_prev
    (cheaper than storing them), carries dh in VMEM scratch and
    accumulates dw_hh / db_hh directly in their (revisited) output
    blocks.

    Like the forward kernel, the direction axis folds into the ROWS of
    the MXU matmuls (the backward previously serialized directions as a
    grid axis — half the rows per issue at the same tile count):

      hw      = h_cat (D*B, H) @ w_cat (H, D*3H), diagonal blocks read
      dh_mat  = dgates_wide (D*B, D*3H) @ wT_stack (D*3H, H) — the
                block-diagonal dgates placement makes row block d see
                only w_hh[d]^T
      dw_cat += h_cat^T-contraction with dgates_wide -> (H, D*3H),
                column block d = direction d's dw_hh
    """
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _reset_carry():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)

    @pl.when((b_idx == 0) & (t_idx == 0))
    def _zero_accumulators():
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref[:])
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref[:])

    # weights ship as bf16 (only ever bf16 MXU operands, f32
    # accumulate) — the full-weight VMEM block at f32 was a dominant
    # fixed cost at H=512 (measured)
    w_cat = wcat_ref[:]      # (H, D*3H)
    w_t = wt_ref[:]          # (D*3H, H), rows d*3H.. = w_hh[d]^T
    bb = hprev_ref.shape[2]
    # (D, 1, 3H) bias -> (D*B, 3H) rows once per kernel invocation
    b_rows = jnp.broadcast_to(
        b_hh_ref[:], (d, bb, 3 * hidden)).reshape(d * bb, 3 * hidden)

    def body(k, carry):
        dh, dw_acc, db_acc = carry  # dh: (D*B, H) f32
        t = t_block - 1 - k  # local reverse sweep
        # xw / h_prev stream bf16 in the forward kernel's (D, T, B, *)
        # layout: the residual is the SAME array the forward consumed
        # (no second f32 copy), and the recomputed gates match the
        # forward's bf16 inputs exactly. (D, B) merges into rows — a
        # layout no-op (both are major dims).
        h_prev_c = hprev_ref[:, t, :, :].reshape(d * bb, hidden)
        h_prev = h_prev_c.astype(jnp.float32)
        xw_t = xw_ref[:, t, :, :].reshape(
            d * bb, 3 * hidden).astype(jnp.float32)
        hw_cat = jnp.dot(h_prev_c, w_cat,
                         preferred_element_type=jnp.float32)
        # per-direction diagonal blocks -> (D*B, 3H)
        hw = jnp.concatenate(
            [hw_cat[di * bb:(di + 1) * bb,
                    di * 3 * hidden:(di + 1) * 3 * hidden]
             for di in range(d)], axis=0) + b_rows
        xr = xw_t[:, :hidden]
        xz = xw_t[:, hidden:2 * hidden]
        xn = xw_t[:, 2 * hidden:]
        hr = hw[:, :hidden]
        hz = hw[:, hidden:2 * hidden]
        hn = hw[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)

        g_t = g_ref[:, :, t, :].reshape(d * bb, hidden)
        dh_total = g_t.astype(jnp.float32) + dh
        dz = dh_total * (h_prev - n) * z * (1. - z)
        dpre_n = dh_total * (1. - z) * (1. - n * n)
        dpre_r = dpre_n * hn * r * (1. - r)
        dxw = jnp.concatenate([dpre_r, dz, dpre_n], axis=-1)
        # T-major write like the xw layout: a dynamic t index on a bf16
        # second-minor dim is unlowerable (sublane pairs pack along it)
        dxw_ref[:, t, :, :] = dxw.astype(dxw_ref.dtype).reshape(
            d, bb, 3 * hidden)
        # grads w.r.t. the hw projection: (dhr, dhz, dhn), placed
        # BLOCK-DIAGONALLY over (D*B, D*3H) so one matmul applies each
        # direction's own w_hh^T / accumulates its own dw column block
        dgates_h = jnp.concatenate(
            [dpre_r, dz, dpre_n * r], axis=-1)  # (D*B, 3H)
        dgates_c = dgates_h.astype(jnp.bfloat16)
        if d == 1:
            dgates_wide = dgates_c
        else:
            dgates_wide = jnp.concatenate([
                jnp.pad(dgates_c[di * bb:(di + 1) * bb],
                        ((0, 0), (di * 3 * hidden,
                                  (d - 1 - di) * 3 * hidden)))
                for di in range(d)], axis=0)
        dh_new = dh_total * z + jnp.dot(
            dgates_wide, w_t, preferred_element_type=jnp.float32)
        dw_acc = dw_acc + jax.lax.dot_general(
            h_prev_c, dgates_wide, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # (1, D*3H): column block d = direction d's bias gradient
        db_acc = db_acc + jnp.concatenate(
            [jnp.sum(dgates_h[di * bb:(di + 1) * bb], axis=0,
                     keepdims=True) for di in range(d)], axis=1)
        return dh_new, dw_acc, db_acc

    dh, dw_acc, db_acc = jax.lax.fori_loop(
        0, t_block, body,
        (dh_scratch[:], jnp.zeros_like(dwhh_ref[:]),
         jnp.zeros_like(dbhh_ref[:])))
    dh_scratch[:] = dh
    dwhh_ref[:] += dw_acc
    dbhh_ref[:] += db_acc

    @pl.when(t_idx == nt - 1)
    def _write_dh0():
        dh0_ref[:] = dh_scratch[:].reshape(d, bb, hidden)


def _gru_bwd_split_kernel(xw_ref, hprev_ref, wcat_ref, b_hh_ref,
                          g_ref, dxw_ref, r_ref, dh0_ref, dh_scratch, *,
                          t_block, hidden, d):
    """SPLIT-variant reverse sweep: like :func:`_gru_bwd_kernel` but
    WITHOUT the in-kernel dw_hh/db_hh accumulation — the revisited
    (h, d*3h) f32 accumulator scales h^2 and is what locks the fused
    kernel out of H=512's VMEM budget (measured: 48 KB over at the
    smallest legal blocking). Instead the kernel emits the recomputed
    reset gate ``r`` (the only gate value the outside contraction
    cannot recover from dxw alone: dgates_n = dxw_n * r), and the
    wrapper computes

        dw_hh[d] = sum_{t,b} h_prev[d,t,b,:] (x) dgates[d,t,b,:]
        db_hh[d] = sum_{t,b} dgates[d,t,b,:]

    as ONE big XLA matmul over the (T*B) axis — embarrassingly MXU
    -friendly, no recurrence. The freed VMEM also doubles the legal
    block_t at flagship size (H=256, D=2: 16 vs the fused kernel's 8).

    The transposed weight stack w_t is also dropped: dh's matmul
    contracts the D*3H axis of the block-diagonal dgates against
    w_cat's COLUMNS (an NT-form dot_general), which is exactly each
    direction's dgates @ w_hh[d]^T — one (h, d*3h) bf16 weight block
    in VMEM instead of two (the second block was the 148 KB-over
    margin at H=256 block_t=16, measured on v5e)."""
    t_idx = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t_idx == 0)
    def _reset_carry():
        dh_scratch[:] = jnp.zeros_like(dh_scratch)

    w_cat = wcat_ref[:]      # (H, D*3H) bf16
    bb = hprev_ref.shape[2]
    b_rows = jnp.broadcast_to(
        b_hh_ref[:], (d, bb, 3 * hidden)).reshape(d * bb, 3 * hidden)

    def body(k, dh):
        t = t_block - 1 - k
        h_prev_c = hprev_ref[:, t, :, :].reshape(d * bb, hidden)
        h_prev = h_prev_c.astype(jnp.float32)
        xw_t = xw_ref[:, t, :, :].reshape(
            d * bb, 3 * hidden).astype(jnp.float32)
        hw_cat = jnp.dot(h_prev_c, w_cat,
                         preferred_element_type=jnp.float32)
        hw = jnp.concatenate(
            [hw_cat[di * bb:(di + 1) * bb,
                    di * 3 * hidden:(di + 1) * 3 * hidden]
             for di in range(d)], axis=0) + b_rows
        xr = xw_t[:, :hidden]
        xz = xw_t[:, hidden:2 * hidden]
        xn = xw_t[:, 2 * hidden:]
        hr = hw[:, :hidden]
        hz = hw[:, hidden:2 * hidden]
        hn = hw[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)

        g_t = g_ref[:, :, t, :].reshape(d * bb, hidden)
        dh_total = g_t.astype(jnp.float32) + dh
        dz = dh_total * (h_prev - n) * z * (1. - z)
        dpre_n = dh_total * (1. - z) * (1. - n * n)
        dpre_r = dpre_n * hn * r * (1. - r)
        dxw = jnp.concatenate([dpre_r, dz, dpre_n], axis=-1)
        dxw_ref[:, t, :, :] = dxw.astype(dxw_ref.dtype).reshape(
            d, bb, 3 * hidden)
        r_ref[:, t, :, :] = r.astype(r_ref.dtype).reshape(d, bb, hidden)
        dgates_h = jnp.concatenate(
            [dpre_r, dz, dpre_n * r], axis=-1)  # (D*B, 3H)
        dgates_c = dgates_h.astype(jnp.bfloat16)
        if d == 1:
            dgates_wide = dgates_c
        else:
            dgates_wide = jnp.concatenate([
                jnp.pad(dgates_c[di * bb:(di + 1) * bb],
                        ((0, 0), (di * 3 * hidden,
                                  (d - 1 - di) * 3 * hidden)))
                for di in range(d)], axis=0)
        # (D*B, D*3H) x (H, D*3H) contracted on dim 1 of both ==
        # per-direction dgates @ w_hh[d]^T (w_t-free, see docstring)
        return dh_total * z + jax.lax.dot_general(
            dgates_wide, w_cat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dh_scratch[:] = jax.lax.fori_loop(
        0, t_block, body, dh_scratch[:])

    @pl.when(t_idx == nt - 1)
    def _write_dh0():
        dh0_ref[:] = dh_scratch[:].reshape(d, bb, hidden)


def _gru_scan_pallas_bwd(xw_tm, w_hh, b_hh, h0, y, g, interpret=False,
                         block_b=None, block_t=None, split=None):
    """Backward pass as one Pallas kernel launch.

    ``xw_tm`` is the forward kernel's OWN (D, T, B, 3H) bf16 input — the
    residual costs no extra copy and the recomputed gates see exactly
    the values the forward used. Returns (dxw, dw_hh, db_hh, dh0) for
    cotangent ``g`` w.r.t. the forward outputs ``y`` (dxw in the
    caller's (D, B, T, 3H) f32 convention). Default block_t adapts to
    d*h (:func:`_bwd_blocks`): 16 at flagship size (32 overflowed
    scoped VMEM by 1.63 MB on v5e with f32 slabs), halving as the
    hidden size grows.
    """
    d, t, b, three_h = xw_tm.shape
    h = three_h // 3
    if split is None:
        # the split variant is both the ONLY one fitting VMEM at
        # h > 256 and measured faster at h = 256 (bigger block_t,
        # no h^2 accumulator in the sweep)
        split = True
    auto_b, auto_t = (_bwd_split_blocks if split
                      else _bwd_blocks)(d, h, b)
    block_b = auto_b if block_b is None else min(block_b, b)
    block_t = auto_t if block_t is None else block_t
    block_t = min(block_t, t)
    # h_prev in the same T-major bf16 layout (one 2-byte copy instead
    # of the old f32 concat + re-read)
    h_prev = jnp.concatenate(
        [h0[:, None, :, :],
         jnp.swapaxes(y, 1, 2)[:, :-1, :, :]], axis=1
    ).astype(jnp.bfloat16)
    t_pad = (-t) % block_t
    # batch must ALSO pad to the block: the dw_hh/db_hh accumulation
    # matmuls mix every row of a block, so out-of-bounds rows of a
    # partial block would corrupt the weight gradients (zero rows
    # contribute zero)
    b_pad = (-b) % block_b
    if t_pad or b_pad:
        pad_tm = ((0, 0), (0, t_pad), (0, b_pad), (0, 0))
        xw_tm = jnp.pad(xw_tm, pad_tm)
        h_prev = jnp.pad(h_prev, pad_tm)
        g = jnp.pad(g, ((0, 0), (0, b_pad), (0, t_pad), (0, 0)))
    tt = t + t_pad
    bb = b + b_pad
    nt = tt // block_t
    grid = (bb // block_b, nt)
    # time blocks are visited in REVERSE (the recurrence runs backward)
    rev = lambda bi, ti: (0, bi, nt - 1 - ti, 0)
    rev_tm = lambda bi, ti: (0, nt - 1 - ti, bi, 0)
    fixed2 = lambda bi, ti: (0, 0)
    in_specs = [
        pl.BlockSpec((d, block_t, block_b, three_h), rev_tm),     # xw
        pl.BlockSpec((d, block_t, block_b, h), rev_tm),           # h_prev
        pl.BlockSpec((h, d * three_h), fixed2),                   # w_cat
        pl.BlockSpec((d, 1, three_h), lambda bi, ti: (0, 0, 0)),
        pl.BlockSpec((d, block_b, block_t, h), rev),              # g
    ]
    if pltpu is None:  # pragma: no cover
        raise RuntimeError('pallas TPU support unavailable')
    # (D, H, 3H) -> (H, D*3H) bf16 weight stack (forward fold layout)
    w_cat = jnp.swapaxes(w_hh, 0, 1).reshape(
        h, d * three_h).astype(jnp.bfloat16)
    args = (xw_tm, h_prev, w_cat,
            b_hh.reshape(d, 1, three_h).astype(jnp.float32),
            g.astype(jnp.float32))
    scratch = [pltpu.VMEM((d * block_b, h), jnp.float32)]
    # dxw ships bf16: it only ever feeds bf16 MXU matmuls downstream
    # (dx = dxw @ w_ih^T, dw_ih = x^T @ dxw), and f32 was half the
    # kernel's HBM write traffic
    if split:
        kernel = functools.partial(
            _gru_bwd_split_kernel, t_block=block_t, hidden=h, d=d)
        dxw, r, dh0 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((d, block_t, block_b, three_h), rev_tm),
                pl.BlockSpec((d, block_t, block_b, h), rev_tm),
                pl.BlockSpec((d, block_b, h),
                             lambda bi, ti: (0, bi, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((d, tt, bb, three_h),
                                     jnp.bfloat16),
                jax.ShapeDtypeStruct((d, tt, bb, h), jnp.bfloat16),
                jax.ShapeDtypeStruct((d, bb, h), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        # outside weight-gradient contraction over (T*B) — padded rows
        # contribute exactly zero (dxw is zero wherever g was padded).
        # In interpret mode (CPU tests) the operands upcast to f32:
        # the CPU backend cannot lower bf16 x bf16 -> f32 dots, and
        # bf16-rounded values in f32 are bit-equivalent.
        dgates = jnp.concatenate(
            [dxw[..., :2 * h], dxw[..., 2 * h:] * r], axis=-1)
        mm = jnp.float32 if interpret else jnp.bfloat16
        dw_hh = jnp.einsum('dtbh,dtbg->dhg', h_prev.astype(mm),
                           dgates.astype(mm),
                           preferred_element_type=jnp.float32)
        db_hh = jnp.sum(dgates.astype(jnp.float32), axis=(1, 2))
        return (jnp.swapaxes(dxw, 1, 2)[:, :b, :t, :], dw_hh,
                db_hh, dh0[:, :b])
    kernel = functools.partial(
        _gru_bwd_kernel, t_block=block_t, hidden=h, d=d)
    out_specs = [
        pl.BlockSpec((d, block_t, block_b, three_h), rev_tm),     # dxw
        pl.BlockSpec((h, d * three_h), fixed2),
        pl.BlockSpec((1, d * three_h), fixed2),
        pl.BlockSpec((d, block_b, h), lambda bi, ti: (0, bi, 0)),
    ]
    # the fused kernel additionally ships the transposed weight stack
    w_t = jnp.swapaxes(w_hh, 1, 2).reshape(
        d * three_h, h).astype(jnp.bfloat16)
    in_specs_f = in_specs[:3] + [
        pl.BlockSpec((d * three_h, h), fixed2)] + in_specs[3:]
    args_f = args[:3] + (w_t,) + args[3:]
    dxw, dw_cat, db_cat, dh0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs_f,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((d, tt, bb, three_h), jnp.bfloat16),
            jax.ShapeDtypeStruct((h, d * three_h), jnp.float32),
            jax.ShapeDtypeStruct((1, d * three_h), jnp.float32),
            jax.ShapeDtypeStruct((d, bb, h), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args_f)
    # (H, D*3H) column blocks -> (D, H, 3H); dxw T-major -> caller's
    # (D, B, T, 3H) (XLA folds the transpose into the consuming dots)
    dw_hh = jnp.moveaxis(
        dw_cat.reshape(h, d, three_h), 1, 0)
    return (jnp.swapaxes(dxw, 1, 2)[:, :b, :t, :], dw_hh,
            db_cat.reshape(d, three_h), dh0[:, :b])


def gru_scan_reference(xw, w_hh, b_hh, h0):
    """lax.scan path with identical semantics (testing + backward).

    Accepts either single-direction args ((B, T, 3H) / (H, 3H) / (3H,) /
    (B, H)) or stacked-direction args with a leading D axis.
    """
    if xw.ndim == 3:
        return _gru_scan_reference_d(
            xw[None], w_hh[None], b_hh[None], h0[None])[0]
    return _gru_scan_reference_d(xw, w_hh, b_hh, h0)


def _gru_scan_reference_d(xw, w_hh, b_hh, h0):
    """(D, B, T, 3H) reference recurrence via one lax.scan."""
    hdim = h0.shape[-1]
    b_hh = b_hh.reshape(b_hh.shape[0], 1, -1)

    def step(h, xw_t):  # h: (D, B, H), xw_t: (D, B, 3H)
        hw = jnp.einsum('dbh,dhg->dbg', h, w_hh) + b_hh
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr = hw[..., :hdim]
        hz = hw[..., hdim:2 * hdim]
        hn = hw[..., 2 * hdim:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1. - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, jnp.moveaxis(xw, 2, 0))
    return jnp.moveaxis(ys, 0, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_scan(xw, w_hh, b_hh, h0, interpret=False):
    """Pallas-accelerated GRU recurrence.

    Args:
        xw: (D, B, T, 3H) precomputed input projections (+ input bias),
            one leading slot per direction (D=1 for unidirectional).
        w_hh: (D, H, 3H) recurrent weights.
        b_hh: (D, 3H) recurrent bias.
        h0: (D, B, H) initial state.
        interpret: run in interpreter mode (CPU testing).

    Returns: (D, B, T, H) hidden states.
    """
    return _gru_scan_pallas(xw, w_hh, b_hh, h0, interpret=interpret)


def _gru_scan_fwd(xw, w_hh, b_hh, h0, interpret=False):
    xw_tm = _to_tm(xw)
    y = _gru_scan_pallas_tm(xw_tm, w_hh, b_hh, h0, interpret=interpret)
    return y, (xw_tm, w_hh, b_hh, h0, y)


def _gru_scan_bwd(interpret, res, g):
    # backward = second Pallas kernel (reverse sweep, gates recomputed
    # from the saved outputs): the whole recurrence stays TWO kernel
    # launches per training step instead of ~2 x T x ~15 scan ops. The
    # xw residual is the forward kernel's own bf16 T-major input.
    xw_tm, w_hh, b_hh, h0, y = res
    dxw, dw_hh, db_hh, dh0 = _gru_scan_pallas_bwd(
        xw_tm, w_hh, b_hh, h0, y, g, interpret=interpret)
    # the kernel writes dxw bf16 (it only feeds bf16 matmuls); the
    # custom_vjp contract wants the primal's f32 — the convert fuses
    # into the consumers (dx matmul + db_ih reduce), no f32 buffer
    return dxw.astype(jnp.float32), dw_hh, db_hh, dh0


gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)
