"""Pallas TPU kernels for the conv2d stack: packed-lane im2col GEMM.

Reference capability being accelerated: the torch ``CNN2d`` tower
(``padertorch/contrib/je/modules/conv.py`` as configured by
``pb_sed/experiments/weak_label_crnn/training.py:158-185``).

Why XLA is slow here (measured on-chip, round 3, bs=32 T=512 bf16
forward): the tower's early layers run far below the MXU tile bound —

    layer        F  Cin->Cout   XLA ms   % peak   tile-model bound
    L0         128    1->16      0.280     0.5%      ~1%
    L1         128   16->16      1.287     1.9%       7%
    L2          64   16->32      0.939     2.6%      14%
    L3          64   32->32      1.826     2.7%      18%
    L4          32   32->64      0.892     5.5%      36%
    L5          32   64->64      0.954    10.3%      45%
    L6          16  64->128      0.453    21.7%      90%
    L7          16 128->128      0.561    35.0%      98%
    L8           8 128->256      0.415    47.3%      98%

(tile model: eff = M*K*N / (ceil(M/128)*ceil(K/128)*ceil(N/128)*128^3)
with M=Cout, K=kt*kf*Cin, N=pixels — XLA never materializes the K=9*Cin
contraction, so it pays ceil-waste on K=Cin AND N=Cout per spatial tap.)

The kernel strategy:

- activations live in HBM as a PACKED buffer (B, C, Ls): channels on
  sublanes (dense — C is 16..256, a multiple of 8), space packed
  time-major on lanes, x4[b, t, f, c] at lane t * Fs + pf + f with
  Fs = F + kf - 1 (the SAME freq halo lives INSIDE each row as zero
  slots; there are NO time-halo rows — see below). No tile padding is
  wasted regardless of F or C, and every im2col tap (dt, df) of a
  time-block becomes ONE STATIC CONTIGUOUS LANE SLICE at offset
  (t0 + dt - pt) * Fs + df - pf — Mosaic supports those (probed),
  unlike any reshape that splits or merges the minor dim (probed:
  rejected).
- the grid walks (example, time-block). The packed example is a
  revisited input block (fetched once per example); outputs are tiled
  (1, Cout, tc*Fs) blocks, so buffers stay small and the per-step
  program is 9 slice-copies + one MXU matmul — an earlier variant that
  unrolled all time-blocks into one giant grid-(B,) program OOM-killed
  the TPU compile backend at C >= 128.
- per block the kt*kf taps are sliced side by side into a bf16 patch
  (K, tc*Fs); taps of the first/last block that would read before/past
  the example zero-fill the out-of-range lanes (this replaces the time
  halo). One MXU matmul (Cout, K) @ (K, tc*Fs) with f32 accumulation
  produces the block at the K = kt*kf*Cin tile bound.
- the kernel masks the wrap-around columns (fp outside [pf, pf+F)) to
  zero, so the structural pad slots of the output are exactly zero and
  the buffer is directly consumable as the next conv's input.
- backward: ONE fused kernel. dx and dw both contract the SAME im2col
  patch of the (structurally re-masked) cotangent: dx = flipped
  channel-transposed weights @ patch (transposed conv), and — by the
  change of variables q = p + off — dw at FLIPPED tap d' is
  (Cin, Lb) x (Kg, Lb)^T against the unshifted input block, into a
  revisited f32 accumulator (grid-serial on TPU: deterministic). The
  forward activation therefore never needs a patch build, gm is read
  once instead of twice, and backward launches halve.

``conv2d_mxu`` is the drop-in (B, T, F, C) wrapper (pack -> kernel ->
unpack); NOTE the per-call pack/unpack relayout costs more than the
kernel saves — production use is the packed TOWER path in ``ops/cnn.py``
which packs once and keeps activations packed across BN/ReLU/conv
chains. The tower uses the FREQ-MAJOR orientation (``fm_geom``): rows
are freq bins, lanes are 128-aligned time — because the reference
tower's pools are freq-only ((2, 1) in its (freq, time) notation), a
pool is then an elementwise max of two CONTIGUOUS row slices
(``maxpool2_rows_packed``) and the packed layout survives every pool
boundary with no relayout. The kernels themselves are orientation
-agnostic ((rows, lanes) blocks); freq-major simply swaps the roles of
the ConvGeom fields and transposes the kernel's first two axes.
Gating follows ops/pallas/gru.py: TPU-only in production,
interpreter mode for CPU tests (ops/rnn.py:set_pallas_mode).
"""
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts (tests run CPU)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# Scoped-VMEM target for the block chooser. Bigger blocks are faster
# (measured on v5e: 9.4 MB patches beat 3 MB ones by 17-26% fwd and
# 9-13% fwd+grad — fewer grid steps amortize per-block patch-build and
# mask overhead) but the TPU scoped-vmem limit is 16 MB and the probe
# that passed standalone at a 9.4 MB patch OOM'd by 284 KB inside the
# full train step — so the chooser models the kernels' ACTUAL footprint
# (patch + double-buffered tiles + f32 accumulator + revisited input +
# weights + dw accumulator) against a 14 MB target instead of sizing
# the patch alone.
_VMEM_TARGET_BYTES = 14 * 1024 * 1024
# acceptance LIMIT on the MINIMAL-block patch: shapes that cannot block
# below this fall back to the XLA conv path
_PATCH_LIMIT_BYTES = 6 * 1024 * 1024
# Per-DIRECTION footprint target for the fm tower's taps-aware block
# chooser (``_fm_dir_bytes``). Calibrated against 12 on-chip
# compile/fail points at the flagship L6-L8 shapes (block sweep,
# round 3): every measured-accepted config modeled <= 12.2 MB, every
# measured-rejected one >= 12.95 MB — 12.5 MB splits them with margin
# on both sides of the 16 MB scoped-VMEM hardware limit.
_VMEM_DIR_TARGET_BYTES = int(12.5 * 1024 * 1024)
# The CHANNEL-BLOCKED taps path gets its own target. v5e calibration
# (round 4, scripts/perf/conv_cblock_calib.py): STANDALONE, every
# config modeled <= 13.25 MB compiles and >= 15.25 MB is rejected —
# but standalone calibration misses IN-SITU scoped-VMEM pressure:
# inside the full deep train step the 13.12 MB-modeled L14 fwd tc=4
# kernel (standalone-real ~15.99 MB) OOMs by 44 KB because XLA
# co-schedules async copies whose scoped allocations share the 16 MB
# stack. 12.75 MB rejects that config and keeps the largest
# in-situ-validated one (L14 bwd tc=2, modeled 12.50 MB); the cost is
# +0.13 ms on L14 fwd (tc=2 0.996 ms vs tc=4 0.869 ms standalone).
_VMEM_CB_TARGET_BYTES = int(12.75 * 1024 * 1024)


def _max_block_lanes(k, cmax, ls, halo=0):
    """Largest per-block lane count Lb whose estimated scoped-VMEM
    footprint fits _VMEM_TARGET_BYTES for BOTH kernels. Footprint model
    (cmax stands in for cin and cout; bf16 = 2 B):

      fixed:   revisited input (cmax, Ls) bf16 + weights (cmax, K) bf16
               + dw accumulator (cmax, K) f32
      per-Lb:  patch (K, Lb) bf16 + two double-buffered (cmax, Lb) bf16
               tiles (in/out) + the (cmax, Lb) f32 matmul accumulator

    ``halo > 0`` additionally charges the pre-rotate scratch of the
    128-aligned (rot) build path — one reused (cmax, Lb + halo) bf16
    buffer (halo = (row_kernel - 1) * fs lanes).
    """
    fixed = cmax * ls * 2 + 6 * cmax * k + 2 * cmax * halo
    per_lane = 2 * k + 12 * cmax + (2 * cmax if halo else 0)
    return max((_VMEM_TARGET_BYTES - fixed) // per_lane, 0)


class ConvGeom(NamedTuple):
    """Static packed-buffer geometry (hashable: custom_vjp nondiff arg).

    Lane map: x4[b, t, f, c] lives at x2[b, c, t * fs + pf + f]; slots
    fp < pf and fp >= pf + f are structural zeros (the SAME-conv freq
    halo). There are no halo ROWS: taps that would read before row 0 or
    past ls are zero-filled by the patch builder's edge clamping.

    The fields are named for the time-major orientation (rows = time);
    the freq-major tower orientation (``fm_geom``) reuses the SAME
    structure with the roles swapped (t = freq rows, f = time lanes,
    kt/kf swapped) — the kernels only ever see (rows, lanes).
    """
    t: int        # real rows (time-major: frames; freq-major: bins)
    f: int        # real slots per row (time-major: bins; fm: frames)
    kt: int       # kernel extent along rows (odd)
    kf: int       # kernel extent along lanes-within-row (odd)
    tc: int       # rows per block
    tp: int       # t padded up to a tc multiple
    fs: int       # lane stride per row (>= f + kf - 1; fm: 128-aligned)
    ls: int       # tp * fs (packed buffer lanes)
    tcb: int = 0  # BACKWARD rows per block (0 -> tc). The backward
    #               kernel's footprint differs from the forward's
    #               (revisited cotangent, dx+x tiles, dwt accumulator),
    #               so its VMEM-optimal block is generally SMALLER —
    #               measured on-chip: the forward wins at blocks whose
    #               backward does not even compile. Must divide tp.

    @property
    def pt(self):
        return (self.kt - 1) // 2

    @property
    def pf(self):
        return (self.kf - 1) // 2


def _with_tc(t, f, kt, kf, tc, fs=None):
    fs = f + kf - 1 if fs is None else fs
    tp = -(-t // tc) * tc
    return ConvGeom(t=t, f=f, kt=kt, kf=kf, tc=tc, tp=tp, fs=fs,
                    ls=tp * fs)


def geom_for(t, f, cin, kt, kf):
    """Geometry whose block size respects the VMEM footprint for cin.

    Mosaic requires tiled block shapes' minor dim divisible by 128, so
    the block's lane count tc*fs must be a 128-multiple: tc is chosen
    as a multiple of u = 128 / gcd(fs, 128) (u itself if the footprint
    is tighter — ``supported`` rejects shapes where even that blows
    the limit)."""
    import math
    assert kt % 2 == 1 and kf % 2 == 1, (kt, kf)
    fs = f + kf - 1
    c = max(cin, 8)
    k = kt * kf * c
    u = 128 // math.gcd(fs, 128)
    budget = _max_block_lanes(k, c, t * fs) // fs
    tc = max(u, min(budget // u, 256 // u) * u)
    return _with_tc(t, f, kt, kf, tc)


def supported(t, f, cin, kt, kf):
    """Whether the kernels handle this conv within VMEM limits (callers
    fall back to the XLA conv path otherwise): the patch at the MINIMAL
    legal block size must fit _PATCH_LIMIT_BYTES and the footprint
    model must admit at least that block."""
    import math
    if kt % 2 == 0 or kf % 2 == 0 or kt * kf <= 1:
        return False
    fs = f + kf - 1
    c = max(cin, 8)
    u = 128 // math.gcd(fs, 128)
    patch = kt * kf * cin * u * fs * 2
    return (patch <= _PATCH_LIMIT_BYTES
            and _max_block_lanes(kt * kf * c, c, t * fs) >= u * fs)


def pack4(x4, geom, dtype=jnp.bfloat16):
    """(B, T, F, C) -> packed (B, C, Ls). Pure pad/transpose/reshape —
    XLA fuses it into producers; autodiff drops pad-slot cotangents."""
    g = geom
    b, t, f, c = x4.shape
    assert (t, f) == (g.t, g.f), ((t, f), g)
    x = jnp.pad(x4.astype(dtype),
                ((0, 0), (0, g.tp - t), (g.pf, g.fs - f - g.pf), (0, 0)))
    return x.transpose(0, 3, 1, 2).reshape(b, c, g.ls)


def unpack4(x2, geom, dtype=None):
    """Packed (B, C, Ls) -> (B, T, F, C): slice the real region."""
    g = geom
    b, c = x2.shape[:2]
    x = x2.reshape(b, c, g.tp, g.fs)
    x = x[:, :, :g.t, g.pf:g.pf + g.f].transpose(0, 2, 3, 1)
    return x if dtype is None else x.astype(dtype)


def lane_mask(geom, dtype=jnp.bfloat16):
    """(1, 1, Ls) 0/1 mask of real-value lanes (row < t, slot fp in
    [pf, pf+f)). Built from iota — fuses into consumers."""
    g = geom
    l = jnp.arange(g.ls)
    row = l // g.fs
    fp = l - row * g.fs
    m = (row < g.t) & (fp >= g.pf) & (fp < g.pf + g.f)
    return m.astype(dtype)[None, None, :]


def _out_mask(g, lb, row0, dtype):
    """(1, Lb) 0/1 mask of real output slots within one block's lanes:
    in-row slot fp in [pf, pf+f) AND global row index (row0 is the
    block's first row, a traced scalar) below the real row count — pad
    rows of the last block must write zeros (+bias would otherwise leak
    into packed consumers)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, lb), 1)
    fp = j % g.fs
    row = row0 + j // g.fs
    return ((fp >= g.pf) & (fp < g.pf + g.f) & (row < g.t)).astype(dtype)


def _build_patch(x_ref, patch, g, cin, t0):
    """Write the kt*kf im2col taps of the block starting at time row
    ``t0`` (a static Python int) into the patch scratch as contiguous
    static lane slices of the packed example. Out-of-range lanes of
    edge blocks zero-fill (this replaces time-halo rows)."""
    lb = g.tc * g.fs
    for dt in range(g.kt):
        for df in range(g.kf):
            k = dt * g.kf + df
            rows = slice(k * cin, (k + 1) * cin)
            off = (t0 + dt - g.pt) * g.fs + (df - g.pf)
            lo = max(off, 0)
            hi = min(off + lb, g.ls)
            if lo == off and hi == off + lb:
                patch[rows, :] = x_ref[0, :, off:off + lb]
            else:  # first/last block edge taps; a whole tap block can
                # be out of range when tc < kt - 1 (hi <= lo) -> zeros
                head = min(max(lo - off, 0), lb)
                n = max(hi - lo, 0)
                if head:
                    patch[rows, :head] = jnp.zeros(
                        (cin, head), patch.dtype)
                if n > 0:
                    patch[rows, head:head + n] = x_ref[0, :, lo:hi]
                if head + n < lb:
                    patch[rows, head + n:] = jnp.zeros(
                        (cin, lb - head - n), patch.dtype)


def _copy_clamped(dst, dst_rows, src_ref, off, n_lanes, cin, dst_lo=0):
    """dst[dst_rows, dst_lo:dst_lo + n_lanes] =
    src_ref[0, :, off:off + n_lanes] with out-of-range source lanes
    zero-filled (off / dst_lo are static ints)."""
    lo = max(off, 0)
    hi = min(off + n_lanes, src_ref.shape[-1])
    head = min(max(lo - off, 0), n_lanes)
    n = max(hi - lo, 0)
    if head:
        dst[dst_rows, dst_lo:dst_lo + head] = jnp.zeros(
            (cin, head), dst.dtype)
    if n > 0:
        dst[dst_rows, dst_lo + head:dst_lo + head + n] = src_ref[
            0, :, lo:hi]
    if head + n < n_lanes:
        dst[dst_rows, dst_lo + head + n:dst_lo + n_lanes] = jnp.zeros(
            (cin, n_lanes - head - n), dst.dtype)


def _use_rot(g):
    """Whether the pre-rotate split build applies (the fm orientation's
    128-aligned rows; tests monkeypatch this to pin bit-exactness
    against the legacy per-tap build)."""
    return g.fs % 128 == 0 and g.kf > 1


def _splits(g):
    """Row sub-ranges processed per grid step on the rot path: two
    halves when the block is splittable. Probed on-chip at splits of
    1/2/4/8: 2 wins ~10% of whole-kernel time at EVERY flagship shape
    (identical with interleaved or grouped matmul order, so the win is
    the smaller live patch+accumulator footprint, not MXU/VPU overlap);
    4 and 8 are flat-to-worse."""
    if g.tc % 2 == 0:
        return ((0, g.tc // 2), (g.tc // 2, g.tc // 2))
    return ((0, g.tc),)


def _build_patch_rot(x_ref, patch, xr, g, cin, t0, row0=0, rows_n=None):
    """128-aligned-lane patch build (production fm orientation) of the
    block-row sub-range [row0, row0 + rows_n).

    ``_build_patch`` issues kt*kf tap copies of which the df != pf ones
    are lane-MISALIGNED by df - pf (not a multiple of the 128-lane
    tile) — Mosaic lowers each through the lane-rotate network, and
    on-chip decomposition measured those 6-of-9 copies at ~1/3 of the
    whole kernel's time (build-only 0.33 ms vs 0.22 ms with the shift
    dropped, at both 16->16 F128 and 64->64 F32). This variant pays the
    rotate ONCE per shift: fill xr (cin, (tc + kt - 1) * fs) with the
    range's halo-extended row span at lane offset dsh (one misaligned
    copy), then the kt row taps of that shift are ALIGNED slices of xr
    (fs is a 128-multiple in the fm orientation). Requires
    g.fs % 128 == 0; edge zero-fill moves into the xr fill."""
    if rows_n is None:
        rows_n = g.tc
    lb = rows_n * g.fs
    lo_lane = row0 * g.fs
    span = (rows_n + g.kt - 1) * g.fs
    base = (t0 + row0 - g.pt) * g.fs
    # centre (already aligned) taps read x_ref directly
    for dt in range(g.kt):
        rows = slice((dt * g.kf + g.pf) * cin,
                     (dt * g.kf + g.pf + 1) * cin)
        _copy_clamped(patch, rows, x_ref, base + dt * g.fs, lb, cin,
                      dst_lo=lo_lane)
    for df in range(g.kf):
        if df == g.pf:
            continue
        _copy_clamped(xr, slice(0, cin), x_ref, base + (df - g.pf),
                      span, cin)
        for dt in range(g.kt):
            rows = slice((dt * g.kf + df) * cin,
                         (dt * g.kf + df + 1) * cin)
            patch[rows, lo_lane:lo_lane + lb] = xr[
                0:cin, dt * g.fs:dt * g.fs + lb]


def _use_taps(g, c):
    """Whether the patch-FREE tap-wise path applies: the per-tap
    matmuls contract K = c, so c must be a 128-multiple or every tap
    pays MXU ceil-waste the shared patch amortizes. Probed on-chip at
    128->128 / 256->256 (fwd) and 128<-128 / 128<-256 (bwd): 8-12%
    faster than the split-rot patch kernels — the patch write + tap
    copies disappear; only the (kf-1) pre-rotate fills remain."""
    return _use_rot(g) and c % 128 == 0


def _shift_list(g):
    return [d - g.pf for d in range(g.kf) if d != g.pf]


def _fill_shifts(src_ref, xr, g, c, t0):
    """Fill xr ((kf-1)*c, span) with the block's halo-extended row span
    at every nonzero lane shift (one misaligned copy each)."""
    span = (g.tc + g.kt - 1) * g.fs
    base = (t0 - g.pt) * g.fs
    for si, dsh in enumerate(_shift_list(g)):
        _copy_clamped(xr, slice(si * c, (si + 1) * c), src_ref,
                      base + dsh, span, c)


def _tap_op(src_ref, xr, tmp, g, c, t0, dt, df):
    """(c, lb) operand of tap (dt, df), or None when fully out of
    range: centre taps read src_ref directly (edge blocks stage a
    zero-filled copy in tmp), shifted taps are ALIGNED slices of the
    pre-rotated xr."""
    lb = g.tc * g.fs
    base = (t0 - g.pt) * g.fs
    if df == g.pf:
        off = base + dt * g.fs
        lo = max(off, 0)
        hi = min(off + lb, src_ref.shape[-1])
        if hi - lo == lb:
            return src_ref[0, :, lo:hi]
        if hi <= lo:
            return None
        _copy_clamped(tmp, slice(0, c), src_ref, off, lb, c)
        return tmp[0:c, :]
    si = _shift_list(g).index(df - g.pf)
    aoff = dt * g.fs
    return xr[si * c:(si + 1) * c, aoff:aoff + lb]


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, patch, *scratch, g, cin,
                cout, use_bias, nb, taps=False):
    """One (example, time-block) grid step: x_ref (1, Cin, Ls) bf16
    revisited, w_ref (Cout, K) bf16, b_ref (Cout, 1) f32, y_ref
    (1, Cout, tc*Fs) bf16 tiled, patch (K, tc*Fs) bf16 scratch."""
    lb = g.tc * g.fs
    ti = pl.program_id(1)
    if taps:  # patch-free tap-wise path (cin % 128 == 0); the first
        # scratch slot holds xr ((kf-1)*cin, span), the second tmp
        xr_t, tmp = patch, scratch[0]
        for blk in range(nb):

            @pl.when(ti == blk)
            def _do(blk=blk):
                t0 = blk * g.tc
                _fill_shifts(x_ref, xr_t, g, cin, t0)
                acc = jnp.zeros((cout, lb), jnp.float32)
                for dt in range(g.kt):
                    for df in range(g.kf):
                        op = _tap_op(x_ref, xr_t, tmp, g, cin, t0, dt,
                                     df)
                        if op is None:
                            continue
                        kk = dt * g.kf + df
                        acc = acc + jnp.dot(
                            w_ref[:, kk * cin:(kk + 1) * cin], op,
                            preferred_element_type=jnp.float32)
                if use_bias:
                    acc = acc + b_ref[:]
                acc = acc * _out_mask(g, lb, t0, jnp.float32)
                y_ref[0, :, :] = acc.astype(y_ref.dtype)
        return
    xr = scratch[0] if scratch else None
    if xr is not None:  # rot path: per-half build + matmul (_splits)
        for blk in range(nb):

            @pl.when(ti == blk)
            def _do(blk=blk):
                t0 = blk * g.tc
                for row0, rows_n in _splits(g):
                    _build_patch_rot(x_ref, patch, xr, g, cin, t0,
                                     row0, rows_n)
                    lo, n = row0 * g.fs, rows_n * g.fs
                    acc = jnp.dot(w_ref[:], patch[:, lo:lo + n],
                                  preferred_element_type=jnp.float32)
                    if use_bias:
                        acc = acc + b_ref[:]
                    acc = acc * _out_mask(g, n, t0 + row0, jnp.float32)
                    y_ref[0, :, lo:lo + n] = acc.astype(y_ref.dtype)
        return
    for blk in range(nb):  # lowered to nb static program variants

        @pl.when(ti == blk)
        def _do(blk=blk):
            _build_patch(x_ref, patch, g, cin, blk * g.tc)

    acc = jnp.dot(w_ref[:], patch[:], preferred_element_type=jnp.float32)
    if use_bias:
        acc = acc + b_ref[:]
    acc = acc * _out_mask(g, lb, ti * g.tc, jnp.float32)
    y_ref[0, :, :] = acc.astype(y_ref.dtype)


def _cb_of(c):
    """Channel block of the CHANNEL-BLOCKED tap-wise path: the grid
    gains a third (channel-block) axis so the VMEM footprint scales
    with a 128-channel slab of the patched source instead of the full
    channel count — the full-source residency (plus Mosaic's window-
    slice copy) is what locked Cin/Cout >= 256 layers into tc=1 blocks
    or out of the packed tower entirely (deep L14 ran 20 ms/step of a
    74 ms step at tc=1; L16 fell back to XLA). 0 = path not applicable
    (the unblocked kernels handle c <= 128)."""
    return 128 if (c % 128 == 0 and c > 128) else 0


def _cb_bwd_of(cin, cout, ls):
    """Channel block of the BACKWARD split (dx/dw) path.

    Everything ``_cb_of`` admits, plus the cout == 128 shapes where the
    fused dx+dw kernel is superadditive: measured on v5e
    (scripts/perf/conv_c128_split_probe.py) the split kernels at
    cb=128 / nc=1 win 3.5x at deep L10 (128->128, F=32, ls=16384 —
    fused 3.60 ms vs split 1.04, dx bit-exact), while the fused kernel
    still wins at shallow L7 (128->128, F=16, ls=8192 — 0.86 vs 0.96).
    The cliff needs BOTH a full-width dx row count (cin >= 128) and the
    large slab: deep L8 (64->128, same ls) stays cheap fused (0.53 ms).
    """
    cb = _cb_of(cout)
    if cb:
        return cb
    if cout == 128 and cin >= 128 and ls >= 16384:
        return 128
    return 0


def _fwd_kernel_cb(x_ref, w_ref, b_ref, y_ref, xr_t, tmp, acc, *, g, cb,
                   nc, cout, use_bias, nb):
    """Channel-blocked tap-wise forward: grid (example, row-block,
    cin-block), cin-block INNERMOST. Each step contracts one
    128-channel slab of the source into the persistent f32 accumulator
    scratch; the last cin step adds bias, masks and writes the output
    block. x_ref (1, cb, Ls) bf16 (tiled over ci, revisited over ti),
    w_ref (1, cout, kt*kf*cb) bf16 tiled over ci, acc (cout, tc*Fs)
    f32 scratch."""
    ti = pl.program_id(1)
    ci = pl.program_id(2)
    lb = g.tc * g.fs

    @pl.when(ci == 0)
    def _zero_acc():
        acc[:] = jnp.zeros_like(acc)

    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            _fill_shifts(x_ref, xr_t, g, cb, t0)
            part = jnp.zeros((cout, lb), jnp.float32)
            for dt in range(g.kt):
                for df in range(g.kf):
                    op = _tap_op(x_ref, xr_t, tmp, g, cb, t0, dt, df)
                    if op is None:
                        continue
                    kk = dt * g.kf + df
                    part = part + jnp.dot(
                        w_ref[0, :, kk * cb:(kk + 1) * cb], op,
                        preferred_element_type=jnp.float32)
            acc[:] += part

            @pl.when(ci == nc - 1)
            def _write():
                a = acc[:]
                if use_bias:
                    a = a + b_ref[:]
                a = a * _out_mask(g, lb, t0, jnp.float32)
                y_ref[0, :, :] = a.astype(y_ref.dtype)


def _bwd_dx_kernel_cb(w_ref, gm_ref, dx_ref, xr_t, tmp, dxacc, *, g,
                      cb, nc, cin, nb):
    """Channel-blocked tap-wise dx: grid (example, row-block,
    cout-block), cout-block INNERMOST. dx accumulates over cout blocks
    in the persistent f32 scratch (masked + written at the last
    block). w_ref (1, cin, kt*kf*cb) flipped+transposed weight block,
    gm_ref (1, cb, Ls) pre-masked cotangent slab.

    dx and dw run as SEPARATE kernels on this path — measured on v5e
    (scripts/perf/conv_cblock_bwd_probe.py, L14 tc=2): the fused
    kernel is wildly superadditive, 7.55 ms vs dx-only 1.69 +
    dw-only 1.72 (tap fills alone cost 1.64, each gradient's matmuls
    < 0.1 on top); re-ordering the taps into split loops inside one
    kernel does NOT recover it (7.37 ms), so the cliff is having both
    output windows + both accumulators live, not tap liveness."""
    ti = pl.program_id(1)
    co = pl.program_id(2)
    lb = g.tc * g.fs

    @pl.when(co == 0)
    def _zero_acc():
        dxacc[:] = jnp.zeros_like(dxacc)

    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            _fill_shifts(gm_ref, xr_t, g, cb, t0)
            part = jnp.zeros((cin, lb), jnp.float32)
            for dt in range(g.kt):
                for df in range(g.kf):
                    op = _tap_op(gm_ref, xr_t, tmp, g, cb, t0, dt, df)
                    if op is None:
                        continue
                    kk = dt * g.kf + df
                    part = part + jnp.dot(
                        w_ref[0, :, kk * cb:(kk + 1) * cb], op,
                        preferred_element_type=jnp.float32)
            dxacc[:] += part

            @pl.when(co == nc - 1)
            def _write():
                dx = dxacc[:] * _out_mask(g, lb, t0, jnp.float32)
                dx_ref[0, :, :] = dx.astype(dx_ref.dtype)


def _bwd_dw_kernel_cb(x_ref, gm_ref, dwt_ref, xr_t, tmp, *, g, cb,
                      nb):
    """Channel-blocked tap-wise dw: grid (example, row-block,
    cout-block). Each step accumulates its own column block of the
    blocked dwt output (zeroed on its first visit) from the forward
    activation block x_ref (1, cin, lb) and the cotangent slab's tap
    ops. See _bwd_dx_kernel_cb for why dx/dw are separate kernels.

    ASSUMPTION (validated on v5e, guarded by the TPU-gated
    ``test_conv_cblock_grad_parity_tpu``): the += into dwt_ref relies
    on Pallas-TPU revisited-output read-modify-write semantics across
    NON-consecutive revisits — the output block's index map depends
    only on the innermost grid dim (co), so the same block is revisited
    once per (example, row-block) with other grid steps in between, and
    Mosaic must preserve (not re-fetch/clobber) the accumulated values.
    Grid execution is serial on TPU, so the accumulation order is
    deterministic."""
    b_idx = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when((b_idx == 0) & (ti == 0))
    def _zero_dwt():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)

    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            _fill_shifts(gm_ref, xr_t, g, cb, t0)
            xb = x_ref[0, :, :]
            for dt in range(g.kt):
                for df in range(g.kf):
                    op = _tap_op(gm_ref, xr_t, tmp, g, cb, t0, dt, df)
                    if op is None:
                        continue
                    kk = dt * g.kf + df
                    dwt_ref[0, :, kk * cb:(kk + 1) * cb] += \
                        jax.lax.dot_general(
                            xb, op, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)


def _bwd_kernel(w_ref, x_ref, gm_ref, dx_ref, dwt_ref, patch, *scratch,
                g, cin, cout, nb, taps=False):
    """Fused dx+dw per (example, time-block) grid step — BOTH gradients
    contract the SAME im2col patch of the cotangent, so the forward
    activation never needs a patch build and gm is read once:

        dx[ci, l]           = sum_kg w_flip2[ci, kg] * gm_patch[kg, l]
        dwt[ci, (d', co)]   = sum_l  x[ci, l]        * gm_patch[(d', co), l]

    where d' is the FLIPPED tap index (change of variables q = p + off:
    dw[d, ci, co] = sum_p gm[co, p] x[ci, p + off(d)]
                  = sum_q x[ci, q] gm[co, q + off(flip(d))]) — the
    wrapper un-flips. w_ref (Cin, Kg) bf16 flipped+transposed weights,
    x_ref (1, Cin, tc*Fs) tiled input block, gm_ref (1, Cout, Ls)
    revisited PRE-MASKED cotangent, dx_ref (1, Cin, tc*Fs) bf16 tiled,
    dwt_ref (Cin, Kg) f32 revisited accumulator (grid-serial on TPU:
    deterministic), patch (Kg, tc*Fs) bf16 scratch, Kg = kt*kf*Cout."""
    b_idx = pl.program_id(0)
    ti = pl.program_id(1)
    lb = g.tc * g.fs

    @pl.when((b_idx == 0) & (ti == 0))
    def _zero():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)

    if taps:  # patch-free tap-wise path (cout % 128 == 0): per tap,
        # dx accumulates (Cin, Cout) @ op and dwt's tap column block
        # accumulates x @ op^T, op being a gm_ref / xr slice
        xr_t, tmp = patch, scratch[0]
        for blk in range(nb):

            @pl.when(ti == blk)
            def _do(blk=blk):
                t0 = blk * g.tc
                _fill_shifts(gm_ref, xr_t, g, cout, t0)
                acc = jnp.zeros((cin, lb), jnp.float32)
                xb = x_ref[0, :, :]
                for dt in range(g.kt):
                    for df in range(g.kf):
                        op = _tap_op(gm_ref, xr_t, tmp, g, cout, t0,
                                     dt, df)
                        if op is None:
                            continue
                        kk = dt * g.kf + df
                        acc = acc + jnp.dot(
                            w_ref[:, kk * cout:(kk + 1) * cout], op,
                            preferred_element_type=jnp.float32)
                        dwt_ref[:, kk * cout:(kk + 1) * cout] += \
                            jax.lax.dot_general(
                                xb, op, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                acc = acc * _out_mask(g, lb, t0, jnp.float32)
                dx_ref[0, :, :] = acc.astype(dx_ref.dtype)
        return

    xr = scratch[0] if scratch else None
    if xr is not None:  # rot path: per-half build + matmuls (_splits)
        for blk in range(nb):

            @pl.when(ti == blk)
            def _do(blk=blk):
                t0 = blk * g.tc
                for row0, rows_n in _splits(g):
                    _build_patch_rot(gm_ref, patch, xr, g, cout, t0,
                                     row0, rows_n)
                    lo, n = row0 * g.fs, rows_n * g.fs
                    dx = jnp.dot(w_ref[:], patch[:, lo:lo + n],
                                 preferred_element_type=jnp.float32)
                    dx = dx * _out_mask(g, n, t0 + row0, jnp.float32)
                    dx_ref[0, :, lo:lo + n] = dx.astype(dx_ref.dtype)
                    # half-range lane contraction; summed over halves
                    # this is exactly the full-block dwt contribution
                    dwt_ref[:] += jax.lax.dot_general(
                        x_ref[0, :, lo:lo + n], patch[:, lo:lo + n],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
        return

    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            _build_patch(gm_ref, patch, g, cout, blk * g.tc)

    dx = jnp.dot(w_ref[:], patch[:], preferred_element_type=jnp.float32)
    dx = dx * _out_mask(g, lb, ti * g.tc, jnp.float32)
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)
    dwt_ref[:] += jax.lax.dot_general(
        x_ref[0, :, :], patch[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _w2(w):
    """(kt, kf, Cin, Cout) -> (Cout, K) bf16 with K in (dt, df, ci)
    order, matching the patch row layout."""
    kt, kf, cin, cout = w.shape
    return w.reshape(kt * kf * cin, cout).T.astype(jnp.bfloat16)


def _fwd_packed(x2, w, b, geom, interpret):
    """Raw packed forward. x2 (B, Cin, Ls) -> (B, Cout, Ls) bf16."""
    g = geom
    bsz, cin, _ = x2.shape
    kt, kf, wcin, cout = w.shape
    assert wcin == cin, (w.shape, x2.shape)
    if pltpu is None:  # pragma: no cover
        raise RuntimeError('pallas TPU support unavailable')
    k = kt * kf * cin
    nb = g.tp // g.tc
    lb = g.tc * g.fs
    b2 = (jnp.zeros((cout, 1), jnp.float32) if b is None
          else b.reshape(cout, 1).astype(jnp.float32))
    rot = _use_rot(g)
    taps = _use_taps(g, cin)
    span = (g.tc + g.kt - 1) * g.fs
    cb = _cb_of(cin) if taps else 0
    if cb:
        nc = cin // cb
        w_b = w.reshape(kt, kf, nc, cb, cout).transpose(
            2, 4, 0, 1, 3).reshape(nc, cout, kt * kf * cb).astype(
                jnp.bfloat16)
        kernel = functools.partial(
            _fwd_kernel_cb, g=g, cb=cb, nc=nc, cout=cout,
            use_bias=b is not None, nb=nb)
        y = pl.pallas_call(
            kernel,
            grid=(bsz, nb, nc),
            in_specs=[
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, ci: (bi, ci, 0)),
                pl.BlockSpec((1, cout, kt * kf * cb),
                             lambda bi, ti, ci: (ci, 0, 0)),
                pl.BlockSpec((cout, 1), lambda bi, ti, ci: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, cout, lb),
                                   lambda bi, ti, ci: (bi, 0, ti)),
            out_shape=jax.ShapeDtypeStruct((bsz, cout, nb * lb),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cb, lb), jnp.bfloat16),
                pltpu.VMEM((cout, lb), jnp.float32),
            ],
            interpret=interpret,
        )(x2.astype(jnp.bfloat16), w_b, b2)
        assert y.shape[-1] == g.ls, (y.shape, g)
        return y
    if taps:
        scratch = [pltpu.VMEM(((g.kf - 1) * cin, span), jnp.bfloat16),
                   pltpu.VMEM((cin, lb), jnp.bfloat16)]
    elif rot:
        scratch = [pltpu.VMEM((k, lb), jnp.bfloat16),
                   pltpu.VMEM((cin, span), jnp.bfloat16)]
    else:
        scratch = [pltpu.VMEM((k, lb), jnp.bfloat16)]
    kernel = functools.partial(
        _fwd_kernel, g=g, cin=cin, cout=cout, use_bias=b is not None,
        nb=nb, taps=taps)
    y = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, cin, g.ls), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((cout, k), lambda bi, ti: (0, 0)),
            pl.BlockSpec((cout, 1), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cout, lb), lambda bi, ti: (bi, 0, ti)),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, nb * lb),
                                       jnp.bfloat16),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x2.astype(jnp.bfloat16), _w2(w), b2)
    assert y.shape[-1] == g.ls, (y.shape, g)
    return y


def _bwd_fused(x2, gm2, w, geom, interpret):
    """Fused packed backward: ONE kernel produces dx AND dw from a
    single cotangent patch (see _bwd_kernel). Returns
    ((B, Cin, Ls) bf16 dx, (kt, kf, Cin, Cout) f32 dw). gm2 must
    already be structurally masked (real-value lanes only)."""
    g = geom
    if g.tcb and g.tcb != g.tc:  # backward-specific row block
        assert g.tp % g.tcb == 0, g
        g = g._replace(tc=g.tcb)
    bsz, cin, _ = x2.shape
    kt, kf, wcin, cout = w.shape
    assert wcin == cin, (w.shape, x2.shape)
    if pltpu is None:  # pragma: no cover
        raise RuntimeError('pallas TPU support unavailable')
    kg = kt * kf * cout
    nb = g.tp // g.tc
    lb = g.tc * g.fs
    # dx = SAME-conv of gm with spatially flipped, channel-transposed w
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    rot = _use_rot(g)
    taps = _use_taps(g, cout)
    span = (g.tc + g.kt - 1) * g.fs
    cb = _cb_bwd_of(cin, cout, g.ls) if taps else 0
    if cb:
        nc = cout // cb
        w_fb = w_flip.reshape(kt, kf, nc, cb, cin).transpose(
            2, 4, 0, 1, 3).reshape(nc, cin, kt * kf * cb).astype(
                jnp.bfloat16)
        gm_bf = gm2.astype(jnp.bfloat16)
        dx = pl.pallas_call(
            functools.partial(_bwd_dx_kernel_cb, g=g, cb=cb, nc=nc,
                              cin=cin, nb=nb),
            grid=(bsz, nb, nc),
            in_specs=[
                pl.BlockSpec((1, cin, kt * kf * cb),
                             lambda bi, ti, co: (co, 0, 0)),
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, co: (bi, co, 0)),
            ],
            out_specs=pl.BlockSpec((1, cin, lb),
                                   lambda bi, ti, co: (bi, 0, ti)),
            out_shape=jax.ShapeDtypeStruct((bsz, cin, nb * lb),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cb, lb), jnp.bfloat16),
                pltpu.VMEM((cin, lb), jnp.float32),
            ],
            interpret=interpret,
        )(w_fb, gm_bf)
        dwt_b = pl.pallas_call(
            functools.partial(_bwd_dw_kernel_cb, g=g, cb=cb, nb=nb),
            grid=(bsz, nb, nc),
            in_specs=[
                pl.BlockSpec((1, cin, lb),
                             lambda bi, ti, co: (bi, 0, ti)),
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, co: (bi, co, 0)),
            ],
            out_specs=pl.BlockSpec((1, cin, kt * kf * cb),
                                   lambda bi, ti, co: (co, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nc, cin, kt * kf * cb),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cb, lb), jnp.bfloat16),
            ],
            interpret=interpret,
        )(x2.astype(jnp.bfloat16), gm_bf)
        assert dx.shape[-1] == g.ls, (dx.shape, g)
        # (nc, cin, (dt', df', cb)) -> (cin, kt, kf, cout), then the
        # same tap un-flip as the unblocked path below
        dwt4 = dwt_b.reshape(nc, cin, kt, kf, cb).transpose(
            1, 2, 3, 0, 4).reshape(cin, kt, kf, cout)
        dw = dwt4[:, ::-1, ::-1, :].transpose(1, 2, 0, 3)
        return dx, dw
    if taps:
        scratch = [pltpu.VMEM(((g.kf - 1) * cout, span), jnp.bfloat16),
                   pltpu.VMEM((cout, lb), jnp.bfloat16)]
    elif rot:
        scratch = [pltpu.VMEM((kg, lb), jnp.bfloat16),
                   pltpu.VMEM((cout, span), jnp.bfloat16)]
    else:
        scratch = [pltpu.VMEM((kg, lb), jnp.bfloat16)]
    kernel = functools.partial(_bwd_kernel, g=g, cin=cin, cout=cout,
                               nb=nb, taps=taps)
    dx, dwt = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((cin, kg), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, cin, lb), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, cout, g.ls), lambda bi, ti: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cin, lb), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((cin, kg), lambda bi, ti: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, cin, nb * lb), jnp.bfloat16),
            jax.ShapeDtypeStruct((cin, kg), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(_w2(w_flip), x2.astype(jnp.bfloat16), gm2.astype(jnp.bfloat16))
    assert dx.shape[-1] == g.ls, (dx.shape, g)
    # dwt[ci, (dt', df', co)] = dw[kt-1-dt', kf-1-df', ci, co]
    dw = dwt.reshape(cin, kt, kf, cout)[:, ::-1, ::-1, :].transpose(
        1, 2, 0, 3)
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv2d_packed(x2, w, b, geom, interpret=False):
    """Odd-kernel stride-1 SAME conv2d on the packed-lane layout.

    Args:
        x2: (B, Cin, Ls) packed input (``pack4``; structural slots 0).
        w: (kt, kf, Cin, Cout) float32 weights.
        b: (Cout,) float32 bias or None.
        geom: ConvGeom (static).
        interpret: run in the Pallas interpreter (CPU tests).

    Returns: (B, Cout, Ls) bfloat16 packed output whose structural
    slots are exactly zero (directly consumable by the next conv).
    """
    return _fwd_packed(x2, w, b, geom, interpret)


def _conv2d_packed_fwd(x2, w, b, geom, interpret):
    return _fwd_packed(x2, w, b, geom, interpret), (x2, w, b is None)


def _conv2d_packed_bwd(geom, interpret, res, gy):
    x2, w, no_bias = res
    # y = mask * raw: kill cotangents at structural slots (the next
    # layer's taps DO read them, so gy is nonzero there)
    gym = gy * lane_mask(geom, gy.dtype)
    gm = gym.astype(jnp.bfloat16)
    dx, dw = _bwd_fused(x2, gm, w, geom, interpret)
    dx = dx.astype(x2.dtype)
    # db in f32 from the UNQUANTIZED cotangent (the kernel's bf16 sum
    # loses ~2% on partially cancelling sums; this fuses into gym)
    db = (None if no_bias
          else jnp.sum(gym.astype(jnp.float32), axis=(0, 2)))
    return dx, dw.astype(w.dtype), db


conv2d_packed.defvjp(_conv2d_packed_fwd, _conv2d_packed_bwd)


def conv2d_mxu(x, w, b, interpret=False):
    """Drop-in (B, T, F, Cin) -> (B, T, F, Cout) bfloat16 SAME conv.

    Matches ``lax.conv_general_dilated(x.astype(bf16), w.astype(bf16),
    (1, 1), 'SAME', NHWC) + b`` — the flax bf16 conv path it replaces —
    with f32 accumulation. pack/unpack are XLA glue whose relayout cost
    exceeds the kernel's win when paid PER LAYER: production use is the
    packed tower (ops/cnn.py), which packs once per tower segment.
    """
    bsz, t, f, cin = x.shape
    kt, kf, _, _ = w.shape
    geom = geom_for(t, f, cin, kt, kf)
    x2 = pack4(x, geom)
    y2 = conv2d_packed(x2, w, b, geom, interpret)
    return unpack4(y2, geom)


# ---------------------------------------------------------------------
# Freq-major packed TOWER orientation (production path, ops/cnn.py)
# ---------------------------------------------------------------------

def _fm_dir_bytes(tc, fs, ls, rk, lk, cin, cout, bwd, fused=False):
    """Scoped-VMEM bytes of ONE kernel direction at row-block ``tc``,
    modeled per the ACTUAL buffers that direction allocates (rk/lk are
    the geom-convention row/lane kernel extents). Tiled blocks are
    charged double-buffered (Mosaic pipelines them); revisited blocks
    and weights single. Calibrated: see _VMEM_DIR_TARGET_BYTES.

    ``fused`` charges the BN+ReLU prologue variants: forward adds the
    (c, span) bf16 staging slab (and drops the centre-tap tmp on the
    taps paths, whose reads all land inside the slab); backward adds
    one f32 lb-tile for the dw-side recomputed activation value."""
    lb = tc * fs
    span = (tc + rk - 1) * fs
    cs = cout if bwd else cin   # patched/revisited source channels
    cd = cin if bwd else cout   # produced channels
    k = rk * lk * cs
    n = 2 * cs * ls             # revisited source (x fwd / cotangent bwd)
    n += 2 * cd * k             # weights (revisited)
    n += 4 * cd * lb            # f32 matmul accumulator
    if bwd:
        n += 8 * cd * lb        # x + dx tiles, double-buffered bf16
        n += 4 * cd * k         # dwt f32 accumulator (revisited)
        if fused:
            n += 4 * cd * lb    # recomputed activation f32 temp
    else:
        n += 4 * cd * lb        # out tile, double-buffered bf16
    cb_blk = (_cb_bwd_of(cin, cout, ls) if bwd else _cb_of(cs)) \
        if (fs % 128 == 0 and lk > 1) else 0
    if cb_blk:
        # CHANNEL-BLOCKED taps path: everything sourced from the
        # patched side scales with the 128-channel slab, the produced
        # side gains a persistent f32 accumulator scratch. Slabs and
        # the weight block are tiled over the channel grid axis
        # (double-buffered); the Mosaic window-slice copy charge of
        # the unblocked path applies to the slab.
        cbk = cb_blk
        kb = rk * lk * cbk
        if cs // cbk == 1:
            # degenerate channel grid (cout == 128 backward split):
            # the slab/weight block indices never change within an
            # example, so they are not double-buffered — measured on
            # v5e (conv_c128_split_probe): L10 split compiles at
            # tc=1/2/4 where the double-buffered charge would put
            # tc >= 2 past the 16 MB hardware limit.
            n = 2 * cbk * ls        # source slab bf16, single
            n += 2 * cbk * ls       # window-slice copy
            n += 2 * cd * kb        # weight block bf16, single
        else:
            n = 4 * cbk * ls        # source slab bf16, double-buffered
            n += 2 * cbk * ls       # window-slice copy (measured, see
            #                         the unblocked charge below)
            n += 4 * cd * kb        # weight block bf16, double-buffered
        n += 4 * cd * lb            # f32 accumulator scratch
        if bwd:
            # the blocked backward runs as TWO kernels (dx, dw — see
            # _bwd_dx_kernel_cb); charging their union here over-counts
            # each single kernel, keeping the chooser conservative
            # against in-situ scoped-VMEM pressure (the validated
            # config is tc=2 at the deep shapes)
            n += 8 * cd * lb        # x + dx tiles bf16, double-buffered
            n += 4 * cd * kb        # dwt f32 column block (revisited)
            if fused:
                n += 4 * cd * lb    # recomputed activation f32 temp
        else:
            n += 4 * cd * lb        # out tile bf16, double-buffered
            if fused:
                # staging slab replaces the tmp tile
                n += 2 * cbk * span - 2 * cbk * lb
        return n
    if fs % 128 == 0 and lk > 1 and cs % 128 == 0:  # taps path
        n += 2 * (lk - 1) * cs * span + 2 * cs * lb   # xr + tmp
        if fused and not bwd:
            # staging slab replaces the tmp tile (all centre-tap reads
            # land inside the slab)
            n += 2 * cs * span - 2 * cs * lb
        # the taps path reads the revisited source through per-tap
        # window slices and Mosaic holds a second copy — measured on
        # v5e: deep L10 fwd (128ch, ls=16k) modeled 12.3 MB at tc=8,
        # real 19.7 MB; shallow L7 bwd modeled 12.3 MB at tc=8, real
        # 17.05 MB. One extra revisited-source charge splits every
        # measured pass/fail point.
        n += 2 * cs * ls
    elif fs % 128 == 0 and lk > 1:                    # rot path
        n += 2 * k * lb + 2 * cs * span               # patch + xr
        if fused and not bwd:
            n += 2 * cs * span                        # staging slab
    else:                                             # legacy build
        n += 2 * k * lb
    return n


def _fm_dir_fits(tc, fs, ls, rk, lk, cin, cout, bwd, fused=False):
    """Whether one direction's modeled footprint fits its calibrated
    target — the channel-blocked branch gets `_VMEM_CB_TARGET_BYTES`,
    everything else `_VMEM_DIR_TARGET_BYTES` (separately calibrated)."""
    cs = cout if bwd else cin
    blocked = fs % 128 == 0 and lk > 1 and (
        _cb_bwd_of(cin, cout, ls) if bwd else _cb_of(cs))
    target = _VMEM_CB_TARGET_BYTES if blocked else _VMEM_DIR_TARGET_BYTES
    return _fm_dir_bytes(tc, fs, ls, rk, lk, cin, cout, bwd,
                         fused=fused) <= target


def fm_geom(t_frames, f_bins, kt, kf, cmax, cin=None, cout=None,
            fused=False):
    """Freq-major geometry: rows = freq bins, lanes = 128-aligned time.

    ``cmax`` is max(cin, cout) of the layer — the backward dx pass runs
    the same kernel with cin' = cout, so the block budget must cover
    both. The row-block size is the largest divisor of f_bins that fits
    the patch budget (divisors avoid wasted pad-row compute; the
    flagship tower's F in {128, 64, 32, 16, 8} always lands on nb = 8
    blocks). fs is 128-aligned so every row boundary — and therefore
    every pool block and patch slice — is lane-tile aligned.

    When ``cin``/``cout`` are given, the forward and backward blocks
    are chosen INDEPENDENTLY from the per-direction footprint model
    (``_fm_dir_bytes``) — the single-``cmax`` model both over-charges
    the taps-path layers for a patch they never allocate and ignores
    that the backward allocates more tiles; measured on-chip (block
    sweep, round 3) the forward wins 11-18% at L6/L7 blocks whose
    backward does not compile. The backward block lands in ``tcb``.
    """
    assert kt % 2 == 1 and kf % 2 == 1, (kt, kf)
    ts = -(-(t_frames + kt - 1) // 128) * 128
    c = max(cmax, 8)
    k = kt * kf * c
    if cin is not None and cout is not None:
        # geom-convention extents: rows = freq (conv kf), lanes = time
        ci, co = max(cin, 8), max(cout, 8)
        fc = fb = 1
        # FORWARD block from the per-direction footprint model (the
        # round-3 on-chip block sweep calibrated exactly this: forward
        # wins 11-18% at L6/L7 blocks whose backward does not compile).
        for d in range(1, f_bins + 1):
            if f_bins % d == 0:
                if _fm_dir_fits(d, ts, f_bins * ts, kf, kt, ci, co,
                                False, fused=fused):
                    fc = d
        # BACKWARD block: the channel-blocked model when the cotangent
        # side is blockable (cout >= 256, 128-multiple — its footprint
        # scales with the 128-channel slab), else the legacy whole-
        # footprint model (production-validated: the per-direction
        # backward model under-counts the UNBLOCKED taps path —
        # measured on v5e: shallow L7 (128->128, F=16) modeled
        # 12.34 MB at tc=8, real 17.05 MB, 1.05 MB over the 16 MB
        # hardware limit). Either way clamped to the forward block
        # (larger-backward blocks are uncalibrated).
        if _cb_bwd_of(ci, co, f_bins * ts) and kt > 1:
            # lane-kernel extent in geom roles
            for d in range(1, f_bins + 1):
                if f_bins % d == 0 and d <= fc:
                    if _fm_dir_fits(d, ts, f_bins * ts, kf, kt, ci,
                                    co, True, fused=fused):
                        fb = d
        else:
            budget = max(1, _max_block_lanes(
                kt * kf * c, c, f_bins * ts, halo=(kf - 1) * ts) // ts)
            for d in range(1, f_bins + 1):
                if f_bins % d == 0 and d <= min(budget, fc):
                    fb = d
        g = _with_tc(f_bins, t_frames, kf, kt, fc, fs=ts)
        return g._replace(tcb=fb) if fb != fc else g
    budget = max(1, _max_block_lanes(
        k, c, f_bins * ts, halo=(kf - 1) * ts) // ts)
    fc = 1
    for d in range(1, f_bins + 1):
        if f_bins % d == 0 and d <= budget:
            fc = d
    # swapped roles: t=rows (freq), f=real lanes per row (time),
    # kt=row kernel extent (the conv's FREQ extent), kf=lane extent
    return _with_tc(f_bins, t_frames, kf, kt, fc, fs=ts)


def fm_supported(t_frames, f_bins, kt, kf, cmax, cin=None, cout=None,
                 fused=False):
    """Whether the freq-major kernels handle this layer within VMEM.

    With ``cin``/``cout`` the acceptance gate mirrors the block
    chooser exactly (``fm_geom``): the legacy whole-footprint model
    must admit a single-row BACKWARD block (production-validated; the
    per-direction backward model under-counts the taps path) and the
    per-direction model must admit a single-row FORWARD block — a
    layer passing the gate always has a compilable block for both
    kernels."""
    if kt % 2 == 0 or kf % 2 == 0 or kt * kf <= 1:
        return False
    ts = -(-(t_frames + kt - 1) // 128) * 128
    c = max(cmax, 8)
    patch = kt * kf * c * ts * 2
    legacy = (patch <= _PATCH_LIMIT_BYTES
              and _max_block_lanes(kt * kf * c, c, f_bins * ts,
                                   halo=(kf - 1) * ts) >= ts)
    if cin is not None and cout is not None:
        ci, co = max(cin, 8), max(cout, 8)
        fwd_ok = _fm_dir_fits(
            1, ts, f_bins * ts, kf, kt, ci, co, False, fused=fused)
        if _cb_bwd_of(ci, co, f_bins * ts) and kt > 1:
            # channel-blocked backward: its own footprint model is the
            # gate (the legacy whole-footprint model charges the FULL
            # revisited source the blocked kernel never holds — it
            # would veto exactly the layers the blocking admits)
            bwd_ok = _fm_dir_fits(
                1, ts, f_bins * ts, kf, kt, ci, co, True, fused=fused)
            return fwd_ok and bwd_ok
        return legacy and fwd_ok
    return legacy


def pack_fm(x4, geom, dtype=jnp.bfloat16):
    """(B, T, F, C) -> freq-major packed (B, C, Ls).

    Lane map: x4[b, t, f, c] at x2[b, c, f * fs + pf + t] (geom fields
    read in swapped roles: geom.t = F rows, geom.f = T, geom.pf = time
    pad). In-row halo slots and pad rows are structural zeros.
    """
    g = geom
    b, t, f, c = x4.shape
    assert (f, t) == (g.t, g.f), ((t, f), g)
    x = jnp.pad(x4.astype(dtype),
                ((0, 0), (g.pf, g.fs - t - g.pf), (0, g.tp - f), (0, 0)))
    return x.transpose(0, 3, 2, 1).reshape(b, c, g.ls)


def unpack_fm(x2, geom, dtype=None):
    """Freq-major packed (B, C, Ls) -> (B, T, F, C) real region."""
    g = geom
    b, c = x2.shape[:2]
    x = x2.reshape(b, c, g.tp, g.fs)
    x = x[:, :, :g.t, g.pf:g.pf + g.f].transpose(0, 3, 2, 1)
    return x if dtype is None else x.astype(dtype)


def fm_valid_mask(geom, seq_len, dtype=jnp.float32):
    """(B, 1, Ls) mask of lanes that are real AND within seq_len —
    the batch-norm statistics mask (matches the unpacked
    MaskedBatchNorm, whose stats see valid frames x all freq bins)."""
    g = geom
    lane = jnp.arange(g.ls)
    frame = lane % g.fs - g.pf
    struct = (lane // g.fs < g.t) & (frame >= 0) & (frame < g.f)
    valid = struct[None, :] & (frame[None, :] < seq_len[:, None])
    return valid.astype(dtype)[:, None, :]


def conv2d_packed_fm(x2, w, b, geom, interpret=False):
    """Freq-major packed SAME conv2d.

    Identical to ``conv2d_packed`` with the kernel's (time, freq) axes
    swapped to match the row/lane roles; the transpose is differentiable
    glue, so the custom VJP's dw maps back automatically.

    Args:
        x2: (B, Cin, Ls) freq-major packed input (``pack_fm``).
        w: (kt, kf, Cin, Cout) float32 weights in the CONV convention
            (kt = time extent) — transposed internally.
        b: (Cout,) float32 bias or None.
        geom: freq-major ConvGeom (``fm_geom``).
    """
    return conv2d_packed(x2, jnp.transpose(w, (1, 0, 2, 3)), b, geom,
                         interpret)


# ---------------------------------------------------------------------------
# BN+ReLU -> conv prologue fusion
#
# The packed tower's pre-activation layers run
#     a = relu(x * scale + shift) * struct_mask ; y = conv(a)
# where scale/shift are the per-channel batch-norm affine folded with the
# (masked) statistics. Materializing ``a`` in HBM costs one full write +
# read of the layer buffer per layer (~1 ms/step on the shallow flagship,
# trace-measured); these kernels apply the affine+ReLU+mask while loading
# the input instead, so ``a`` never exists outside VMEM. The backward
# chain through the affine runs as ONE flat XLA pass over (da, x) — the
# same pass count the unfused BN backward already paid — and the dw-side
# kernels recompute ``a`` from the raw input at load time.


def _stage_bnrelu(src_ref, xa, sc, sh, g, c, t0):
    """xa[0] <- relu(src * sc + sh) * mask over the block's halo-extended
    row span [t0 - pt, t0 - pt + span/fs); rows outside the packed buffer
    zero-fill, structural lanes (in-row halo slots, pad rows >= t) are
    masked to zero — the taps may read any of them. ``t0`` is static, so
    the span bounds and the mask are compile-time constants. The affine
    runs in f32 (Mosaic on v5e cannot lower packed-bf16 cmpf; max() in
    f32, cast on store)."""
    span = xa.shape[-1]
    base = (t0 - g.pt) * g.fs
    lo = max(base, 0)
    hi = min(base + span, g.ls)
    head = lo - base
    n = hi - lo
    if head:
        xa[0, :, :head] = jnp.zeros((c, head), xa.dtype)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    fp = j % g.fs   # lo is an fs multiple: in-row slot == j % fs
    row = lo // g.fs + j // g.fs
    m = ((fp >= g.pf) & (fp < g.pf + g.f)
         & (row < g.t)).astype(jnp.float32)
    v = src_ref[0, :, lo:hi].astype(jnp.float32)
    xa[0, :, head:head + n] = (
        jnp.maximum(v * sc + sh, 0.) * m).astype(xa.dtype)
    if head + n < span:
        xa[0, :, head + n:] = jnp.zeros((c, span - head - n), xa.dtype)


def _bn_tile(x_ref, sc, sh, g, lo, n, row0):
    """relu(x_ref[0, :, lo:lo+n] * sc + sh) * mask as a bf16 VALUE — the
    backward kernels' x tiles are lane-tile ALIGNED blocks, so the
    transform needs no staging scratch; ``row0`` may be traced
    (``_out_mask`` handles it)."""
    v = x_ref[0, :, lo:lo + n].astype(jnp.float32)
    a = jnp.maximum(v * sc + sh, 0.) * _out_mask(g, n, row0, jnp.float32)
    return a.astype(jnp.bfloat16)


def _fwd_kernel_bn(x_ref, w_ref, b_ref, sc_ref, sh_ref, y_ref, xa,
                   patch, *scratch, g, cin, cout, use_bias, nb, taps):
    """BN+ReLU fused forward (fm rot/taps paths): stage the block's
    transformed halo span into ``xa`` once, then run the standard tap
    matmuls reading xa — xa's row 0 is the block's first halo row, so
    the source offset base is ``pt`` instead of ``t0``. Out-of-span
    reads of the shift fills see xa's zero-filled/masked lanes, which
    equal the true structural zeros (_stage_bnrelu)."""
    lb = g.tc * g.fs
    ti = pl.program_id(1)
    sc = sc_ref[:, 0:1]
    sh = sh_ref[:, 0:1]
    if taps:
        xr_t = patch
        for blk in range(nb):

            @pl.when(ti == blk)
            def _do(blk=blk):
                t0 = blk * g.tc
                _stage_bnrelu(x_ref, xa, sc, sh, g, cin, t0)
                _fill_shifts(xa, xr_t, g, cin, g.pt)
                acc = jnp.zeros((cout, lb), jnp.float32)
                for dt in range(g.kt):
                    for df in range(g.kf):
                        # src=xa with t0=pt: centre taps are always
                        # in-range slices, so no tmp staging exists
                        op = _tap_op(xa, xr_t, None, g, cin, g.pt,
                                     dt, df)
                        kk = dt * g.kf + df
                        acc = acc + jnp.dot(
                            w_ref[:, kk * cin:(kk + 1) * cin], op,
                            preferred_element_type=jnp.float32)
                if use_bias:
                    acc = acc + b_ref[:]
                acc = acc * _out_mask(g, lb, t0, jnp.float32)
                y_ref[0, :, :] = acc.astype(y_ref.dtype)
        return
    xr = scratch[0]
    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            _stage_bnrelu(x_ref, xa, sc, sh, g, cin, t0)
            for row0, rows_n in _splits(g):
                _build_patch_rot(xa, patch, xr, g, cin, g.pt, row0,
                                 rows_n)
                lo, n = row0 * g.fs, rows_n * g.fs
                acc = jnp.dot(w_ref[:], patch[:, lo:lo + n],
                              preferred_element_type=jnp.float32)
                if use_bias:
                    acc = acc + b_ref[:]
                acc = acc * _out_mask(g, n, t0 + row0, jnp.float32)
                y_ref[0, :, lo:lo + n] = acc.astype(y_ref.dtype)


def _fwd_kernel_cb_bn(x_ref, w_ref, b_ref, sc_ref, sh_ref, y_ref, xa,
                      xr_t, acc, *, g, cb, nc, cout, use_bias, nb):
    """Channel-blocked fused forward: ``_fwd_kernel_cb`` with the cin
    slab staged through the affine+ReLU+mask (scale/shift enter as
    (1, cb, 1) blocks tiled over the cin grid axis)."""
    ti = pl.program_id(1)
    ci = pl.program_id(2)
    lb = g.tc * g.fs
    sc = sc_ref[0, :, 0:1]
    sh = sh_ref[0, :, 0:1]

    @pl.when(ci == 0)
    def _zero_acc():
        acc[:] = jnp.zeros_like(acc)

    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            _stage_bnrelu(x_ref, xa, sc, sh, g, cb, t0)
            _fill_shifts(xa, xr_t, g, cb, g.pt)
            part = jnp.zeros((cout, lb), jnp.float32)
            for dt in range(g.kt):
                for df in range(g.kf):
                    op = _tap_op(xa, xr_t, None, g, cb, g.pt, dt, df)
                    kk = dt * g.kf + df
                    part = part + jnp.dot(
                        w_ref[0, :, kk * cb:(kk + 1) * cb], op,
                        preferred_element_type=jnp.float32)
            acc[:] += part

            @pl.when(ci == nc - 1)
            def _write():
                a = acc[:]
                if use_bias:
                    a = a + b_ref[:]
                a = a * _out_mask(g, lb, t0, jnp.float32)
                y_ref[0, :, :] = a.astype(y_ref.dtype)


def _bwd_kernel_bn(w_ref, x_ref, gm_ref, sc_ref, sh_ref, dx_ref,
                   dwt_ref, patch, *scratch, g, cin, cout, nb, taps):
    """Fused dx+dw backward with the x tile transformed at load: dx is
    the plain cotangent conv (gradient w.r.t. the POST-activation
    buffer ``a`` — the affine/ReLU chain runs outside, see
    ``_bnrelu_conv2d_packed_bwd``), while dwt contracts the recomputed
    ``a`` tile."""
    b_idx = pl.program_id(0)
    ti = pl.program_id(1)
    lb = g.tc * g.fs
    sc = sc_ref[:, 0:1]
    sh = sh_ref[:, 0:1]

    @pl.when((b_idx == 0) & (ti == 0))
    def _zero():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)

    if taps:
        xr_t, tmp = patch, scratch[0]
        for blk in range(nb):

            @pl.when(ti == blk)
            def _do(blk=blk):
                t0 = blk * g.tc
                _fill_shifts(gm_ref, xr_t, g, cout, t0)
                acc = jnp.zeros((cin, lb), jnp.float32)
                xb = _bn_tile(x_ref, sc, sh, g, 0, lb, t0)
                for dt in range(g.kt):
                    for df in range(g.kf):
                        op = _tap_op(gm_ref, xr_t, tmp, g, cout, t0,
                                     dt, df)
                        if op is None:
                            continue
                        kk = dt * g.kf + df
                        acc = acc + jnp.dot(
                            w_ref[:, kk * cout:(kk + 1) * cout], op,
                            preferred_element_type=jnp.float32)
                        dwt_ref[:, kk * cout:(kk + 1) * cout] += \
                            jax.lax.dot_general(
                                xb, op, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
                acc = acc * _out_mask(g, lb, t0, jnp.float32)
                dx_ref[0, :, :] = acc.astype(dx_ref.dtype)
        return

    xr = scratch[0]
    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            for row0, rows_n in _splits(g):
                _build_patch_rot(gm_ref, patch, xr, g, cout, t0,
                                 row0, rows_n)
                lo, n = row0 * g.fs, rows_n * g.fs
                dx = jnp.dot(w_ref[:], patch[:, lo:lo + n],
                             preferred_element_type=jnp.float32)
                dx = dx * _out_mask(g, n, t0 + row0, jnp.float32)
                dx_ref[0, :, lo:lo + n] = dx.astype(dx_ref.dtype)
                dwt_ref[:] += jax.lax.dot_general(
                    _bn_tile(x_ref, sc, sh, g, lo, n, t0 + row0),
                    patch[:, lo:lo + n],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)


def _bwd_dw_kernel_cb_bn(x_ref, gm_ref, sc_ref, sh_ref, dwt_ref, xr_t,
                         tmp, *, g, cb, nb):
    """Channel-blocked dw with the x tile (FULL cin — the channel
    blocking is on the cotangent side) recomputed through the
    affine+ReLU+mask at load. Same revisited-output RMW contract as
    ``_bwd_dw_kernel_cb``."""
    b_idx = pl.program_id(0)
    ti = pl.program_id(1)
    lb = g.tc * g.fs
    sc = sc_ref[:, 0:1]
    sh = sh_ref[:, 0:1]

    @pl.when((b_idx == 0) & (ti == 0))
    def _zero_dwt():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)

    for blk in range(nb):

        @pl.when(ti == blk)
        def _do(blk=blk):
            t0 = blk * g.tc
            _fill_shifts(gm_ref, xr_t, g, cb, t0)
            xb = _bn_tile(x_ref, sc, sh, g, 0, lb, t0)
            for dt in range(g.kt):
                for df in range(g.kf):
                    op = _tap_op(gm_ref, xr_t, tmp, g, cb, t0, dt, df)
                    if op is None:
                        continue
                    kk = dt * g.kf + df
                    dwt_ref[0, :, kk * cb:(kk + 1) * cb] += \
                        jax.lax.dot_general(
                            xb, op, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)


def _fwd_packed_bn(x2, scale, shift, w, b, geom, interpret):
    """Raw fused forward: conv(relu(x2 * scale + shift) * struct_mask).

    Mirrors ``_fwd_packed`` (fm rot/taps/channel-blocked paths; the
    legacy non-128-aligned build is not wired — the packed tower never
    produces it) plus the staging slab ``xa`` and the (Cin, 1) f32
    scale/shift inputs."""
    g = geom
    bsz, cin, _ = x2.shape
    kt, kf, wcin, cout = w.shape
    assert wcin == cin, (w.shape, x2.shape)
    if pltpu is None:  # pragma: no cover
        raise RuntimeError('pallas TPU support unavailable')
    k = kt * kf * cin
    nb = g.tp // g.tc
    lb = g.tc * g.fs
    b2 = (jnp.zeros((cout, 1), jnp.float32) if b is None
          else b.reshape(cout, 1).astype(jnp.float32))
    sc2 = scale.reshape(cin, 1).astype(jnp.float32)
    sh2 = shift.reshape(cin, 1).astype(jnp.float32)
    rot = _use_rot(g)
    taps = _use_taps(g, cin)
    assert rot or taps, ('bnrelu fusion requires the 128-aligned fm '
                         'paths', g)
    span = (g.tc + g.kt - 1) * g.fs
    cb = _cb_of(cin) if taps else 0
    if cb:
        nc = cin // cb
        w_b = w.reshape(kt, kf, nc, cb, cout).transpose(
            2, 4, 0, 1, 3).reshape(nc, cout, kt * kf * cb).astype(
                jnp.bfloat16)
        kernel = functools.partial(
            _fwd_kernel_cb_bn, g=g, cb=cb, nc=nc, cout=cout,
            use_bias=b is not None, nb=nb)
        y = pl.pallas_call(
            kernel,
            grid=(bsz, nb, nc),
            in_specs=[
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, ci: (bi, ci, 0)),
                pl.BlockSpec((1, cout, kt * kf * cb),
                             lambda bi, ti, ci: (ci, 0, 0)),
                pl.BlockSpec((cout, 1), lambda bi, ti, ci: (0, 0)),
                pl.BlockSpec((1, cb, 1), lambda bi, ti, ci: (ci, 0, 0)),
                pl.BlockSpec((1, cb, 1), lambda bi, ti, ci: (ci, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, cout, lb),
                                   lambda bi, ti, ci: (bi, 0, ti)),
            out_shape=jax.ShapeDtypeStruct((bsz, cout, nb * lb),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((1, cb, span), jnp.bfloat16),
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cout, lb), jnp.float32),
            ],
            interpret=interpret,
        )(x2.astype(jnp.bfloat16), w_b, b2,
          sc2.reshape(nc, cb, 1), sh2.reshape(nc, cb, 1))
        assert y.shape[-1] == g.ls, (y.shape, g)
        return y
    if taps:
        scratch = [pltpu.VMEM(((g.kf - 1) * cin, span), jnp.bfloat16)]
    else:
        scratch = [pltpu.VMEM((k, lb), jnp.bfloat16),
                   pltpu.VMEM((cin, span), jnp.bfloat16)]
    kernel = functools.partial(
        _fwd_kernel_bn, g=g, cin=cin, cout=cout, use_bias=b is not None,
        nb=nb, taps=taps)
    y = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, cin, g.ls), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((cout, k), lambda bi, ti: (0, 0)),
            pl.BlockSpec((cout, 1), lambda bi, ti: (0, 0)),
            pl.BlockSpec((cin, 1), lambda bi, ti: (0, 0)),
            pl.BlockSpec((cin, 1), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cout, lb), lambda bi, ti: (bi, 0, ti)),
        out_shape=jax.ShapeDtypeStruct((bsz, cout, nb * lb),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, cin, span), jnp.bfloat16)]
        + scratch,
        interpret=interpret,
    )(x2.astype(jnp.bfloat16), _w2(w), b2, sc2, sh2)
    assert y.shape[-1] == g.ls, (y.shape, g)
    return y


def _bwd_fused_bn(x2, scale, shift, gm2, w, geom, interpret):
    """Fused backward for the BN+ReLU conv: returns
    ((B, Cin, Ls) bf16 da — gradient w.r.t. the post-activation buffer,
    (kt, kf, Cin, Cout) f32 dw). Mirrors ``_bwd_fused`` with the dw-side
    x tiles recomputed through the affine (the dx side never reads x)."""
    g = geom
    if g.tcb and g.tcb != g.tc:
        assert g.tp % g.tcb == 0, g
        g = g._replace(tc=g.tcb)
    bsz, cin, _ = x2.shape
    kt, kf, wcin, cout = w.shape
    assert wcin == cin, (w.shape, x2.shape)
    if pltpu is None:  # pragma: no cover
        raise RuntimeError('pallas TPU support unavailable')
    kg = kt * kf * cout
    nb = g.tp // g.tc
    lb = g.tc * g.fs
    sc2 = scale.reshape(cin, 1).astype(jnp.float32)
    sh2 = shift.reshape(cin, 1).astype(jnp.float32)
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    rot = _use_rot(g)
    taps = _use_taps(g, cout)
    assert rot or taps, ('bnrelu fusion requires the 128-aligned fm '
                         'paths', g)
    span = (g.tc + g.kt - 1) * g.fs
    cb = _cb_bwd_of(cin, cout, g.ls) if taps else 0
    if cb:
        nc = cout // cb
        w_fb = w_flip.reshape(kt, kf, nc, cb, cin).transpose(
            2, 4, 0, 1, 3).reshape(nc, cin, kt * kf * cb).astype(
                jnp.bfloat16)
        gm_bf = gm2.astype(jnp.bfloat16)
        da = pl.pallas_call(
            functools.partial(_bwd_dx_kernel_cb, g=g, cb=cb, nc=nc,
                              cin=cin, nb=nb),
            grid=(bsz, nb, nc),
            in_specs=[
                pl.BlockSpec((1, cin, kt * kf * cb),
                             lambda bi, ti, co: (co, 0, 0)),
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, co: (bi, co, 0)),
            ],
            out_specs=pl.BlockSpec((1, cin, lb),
                                   lambda bi, ti, co: (bi, 0, ti)),
            out_shape=jax.ShapeDtypeStruct((bsz, cin, nb * lb),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cb, lb), jnp.bfloat16),
                pltpu.VMEM((cin, lb), jnp.float32),
            ],
            interpret=interpret,
        )(w_fb, gm_bf)
        dwt_b = pl.pallas_call(
            functools.partial(_bwd_dw_kernel_cb_bn, g=g, cb=cb, nb=nb),
            grid=(bsz, nb, nc),
            in_specs=[
                pl.BlockSpec((1, cin, lb),
                             lambda bi, ti, co: (bi, 0, ti)),
                pl.BlockSpec((1, cb, g.ls),
                             lambda bi, ti, co: (bi, co, 0)),
                pl.BlockSpec((cin, 1), lambda bi, ti, co: (0, 0)),
                pl.BlockSpec((cin, 1), lambda bi, ti, co: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, cin, kt * kf * cb),
                                   lambda bi, ti, co: (co, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nc, cin, kt * kf * cb),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(((g.kf - 1) * cb, span), jnp.bfloat16),
                pltpu.VMEM((cb, lb), jnp.bfloat16),
            ],
            interpret=interpret,
        )(x2.astype(jnp.bfloat16), gm_bf, sc2, sh2)
        assert da.shape[-1] == g.ls, (da.shape, g)
        dwt4 = dwt_b.reshape(nc, cin, kt, kf, cb).transpose(
            1, 2, 3, 0, 4).reshape(cin, kt, kf, cout)
        dw = dwt4[:, ::-1, ::-1, :].transpose(1, 2, 0, 3)
        return da, dw
    if taps:
        scratch = [pltpu.VMEM(((g.kf - 1) * cout, span), jnp.bfloat16),
                   pltpu.VMEM((cout, lb), jnp.bfloat16)]
    else:
        scratch = [pltpu.VMEM((kg, lb), jnp.bfloat16),
                   pltpu.VMEM((cout, span), jnp.bfloat16)]
    kernel = functools.partial(_bwd_kernel_bn, g=g, cin=cin, cout=cout,
                               nb=nb, taps=taps)
    da, dwt = pl.pallas_call(
        kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((cin, kg), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, cin, lb), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, cout, g.ls), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((cin, 1), lambda bi, ti: (0, 0)),
            pl.BlockSpec((cin, 1), lambda bi, ti: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cin, lb), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((cin, kg), lambda bi, ti: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, cin, nb * lb), jnp.bfloat16),
            jax.ShapeDtypeStruct((cin, kg), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(_w2(w_flip), x2.astype(jnp.bfloat16), gm2.astype(jnp.bfloat16),
      sc2, sh2)
    assert da.shape[-1] == g.ls, (da.shape, g)
    dw = dwt.reshape(cin, kt, kf, cout)[:, ::-1, ::-1, :].transpose(
        1, 2, 0, 3)
    return da, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bnrelu_conv2d_packed(x2, scale, shift, w, b, geom, interpret=False):
    """conv2d_packed(relu(x2 * scale + shift) * struct_mask).

    ``scale``/``shift`` are (Cin,) f32 per-channel affines (the folded
    batch-norm: scale = gamma * rsqrt(var + eps), shift = beta -
    mean * scale); everything else matches ``conv2d_packed``. The
    post-activation buffer never materializes in HBM."""
    return _fwd_packed_bn(x2, scale, shift, w, b, geom, interpret)


def _bnrelu_conv2d_packed_fwd(x2, scale, shift, w, b, geom, interpret):
    y = _fwd_packed_bn(x2, scale, shift, w, b, geom, interpret)
    return y, (x2, scale, shift, w, b is None)


def _bnrelu_conv2d_packed_bwd(geom, interpret, res, gy):
    x2, scale, shift, w, no_bias = res
    gym = gy * lane_mask(geom, gy.dtype)
    gm = gym.astype(jnp.bfloat16)
    da, dw = _bwd_fused_bn(x2, scale, shift, gm, w, geom, interpret)
    db = (None if no_bias
          else jnp.sum(gym.astype(jnp.float32), axis=(0, 2)))
    # chain through a = relu(x*s + t) * mask in ONE flat XLA pass over
    # (da, x): dz = da * 1[z > 0] * mask, dx = dz * s; the per-channel
    # reductions fuse into the same read
    xf = x2.astype(jnp.float32)
    sc = scale.astype(jnp.float32).reshape(1, -1, 1)
    sh = shift.astype(jnp.float32).reshape(1, -1, 1)
    gate = ((xf * sc + sh > 0.)
            & (lane_mask(geom, jnp.float32) > 0.))
    dz = jnp.where(gate, da.astype(jnp.float32), 0.)
    dx = (dz * sc).astype(x2.dtype)
    dscale = jnp.sum(dz * xf, axis=(0, 2)).astype(scale.dtype)
    dshift = jnp.sum(dz, axis=(0, 2)).astype(shift.dtype)
    return dx, dscale, dshift, dw.astype(w.dtype), db


bnrelu_conv2d_packed.defvjp(_bnrelu_conv2d_packed_fwd,
                            _bnrelu_conv2d_packed_bwd)


def bnrelu_conv2d_packed_fm(x2, scale, shift, w, b, geom,
                            interpret=False):
    """Freq-major ``bnrelu_conv2d_packed`` (kernel (time, freq) axes
    swapped, like ``conv2d_packed_fm``)."""
    return bnrelu_conv2d_packed(x2, scale, shift,
                                jnp.transpose(w, (1, 0, 2, 3)), b,
                                geom, interpret)


def _pool_fwd_kernel(x_ref, y_ref, *, rows, ts):
    """Row-pair max: x_ref (1, C, 2*rows*ts) -> y_ref (1, C, rows*ts).
    Structural zeros survive (max(0, 0) = 0), so the output is directly
    a valid packed buffer at the halved freq-row count. Compare in f32:
    Mosaic cannot lower elementwise cmpf on packed bf16 vectors
    ("Target does not support this comparison" on v5e)."""
    for r in range(rows):
        a = x_ref[0, :, 2 * r * ts:(2 * r + 1) * ts].astype(jnp.float32)
        b = x_ref[0, :, (2 * r + 1) * ts:(2 * r + 2) * ts].astype(
            jnp.float32)
        y_ref[0, :, r * ts:(r + 1) * ts] = jnp.maximum(a, b).astype(
            y_ref.dtype)


def _pool_bwd_kernel(x_ref, g_ref, dx_ref, *, rows, ts):
    """Route the cotangent to the argmax row (ties -> the first row,
    matching XLA select-and-scatter / torch max-pool). f32 compare:
    see _pool_fwd_kernel."""
    for r in range(rows):
        a = x_ref[0, :, 2 * r * ts:(2 * r + 1) * ts].astype(jnp.float32)
        b = x_ref[0, :, (2 * r + 1) * ts:(2 * r + 2) * ts].astype(
            jnp.float32)
        gy = g_ref[0, :, r * ts:(r + 1) * ts].astype(jnp.float32)
        zero = jnp.zeros_like(gy)
        keep = a >= b
        dx_ref[0, :, 2 * r * ts:(2 * r + 1) * ts] = jnp.where(
            keep, gy, zero).astype(dx_ref.dtype)
        dx_ref[0, :, (2 * r + 1) * ts:(2 * r + 2) * ts] = jnp.where(
            keep, zero, gy).astype(dx_ref.dtype)


def _pool_cblock(c, f_out, ts, bwd):
    """Channel block for the pool kernels. Whole-(C, Ls) blocks
    overflow scoped VMEM at deep geometries (measured on v5e: C=256,
    ls=8192 forward = 20 MB real vs the 16 MB limit); the row-pair max
    is elementwise across channels, so blocking C is exact. Per-channel
    bytes: fwd in+out = 6*f_out*ts, bwd x+g+dx = 10*f_out*ts, double-
    buffered (x2); a 6 MB budget leaves margin for Mosaic fixed
    structures. Channel tiling is (8, 128), so blocks stay multiples
    of 8."""
    per = (10 if bwd else 6) * f_out * ts * 2
    budget = 6 * 1024 * 1024
    cb = c
    # halving must stop before the block loses 8-alignment: c=48 would
    # otherwise yield cb=12 or 6, breaking the (8, 128) sublane tiling
    # (ADVICE r4); production channel counts are powers of two and
    # never hit this, but 16-multiples are legal inputs
    while cb > 8 and cb % 2 == 0 and (cb // 2) % 8 == 0 \
            and per * cb > budget:
        cb //= 2
    return cb


def _pool_fwd(x2, f_out, ts, interpret):
    bsz, c, ls = x2.shape
    assert ls == 2 * f_out * ts, (x2.shape, f_out, ts)
    cb = _pool_cblock(c, f_out, ts, bwd=False)
    kernel = functools.partial(_pool_fwd_kernel, rows=f_out, ts=ts)
    return pl.pallas_call(
        kernel,
        grid=(bsz, c // cb),
        in_specs=[pl.BlockSpec((1, cb, ls), lambda bi, ci: (bi, ci, 0))],
        out_specs=pl.BlockSpec((1, cb, f_out * ts),
                               lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, c, f_out * ts), x2.dtype),
        interpret=interpret,
    )(x2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def maxpool2_rows_packed(x2, f_out, ts, interpret=False):
    """(2, 1)-max-pool on the freq-major packed layout: the freq-row
    count halves, rows stay ts lanes. x2 (B, C, 2*f_out*ts) ->
    (B, C, f_out*ts)."""
    return _pool_fwd(x2, f_out, ts, interpret)


def _pool_vjp_fwd(x2, f_out, ts, interpret):
    return _pool_fwd(x2, f_out, ts, interpret), x2


def _pool_vjp_bwd(f_out, ts, interpret, x2, gy):
    bsz, c, ls = x2.shape
    cb = _pool_cblock(c, f_out, ts, bwd=True)
    kernel = functools.partial(_pool_bwd_kernel, rows=f_out, ts=ts)
    dx = pl.pallas_call(
        kernel,
        grid=(bsz, c // cb),
        in_specs=[
            pl.BlockSpec((1, cb, ls), lambda bi, ci: (bi, ci, 0)),
            pl.BlockSpec((1, cb, f_out * ts),
                         lambda bi, ci: (bi, ci, 0)),
        ],
        out_specs=pl.BlockSpec((1, cb, ls), lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, c, ls), gy.dtype),
        interpret=interpret,
    )(x2, gy.astype(x2.dtype))
    return (dx.astype(x2.dtype),)


maxpool2_rows_packed.defvjp(_pool_vjp_fwd, _pool_vjp_bwd)


def _avg_fwd_kernel(x_ref, y_ref, *, rows, ts):
    """Row-pair mean: x_ref (1, C, 2*rows*ts) -> y_ref (1, C, rows*ts)
    in f32 — bit-identical to XLA's reduce-sum + *0.5 lowering of
    ``mean`` over the pair axis (f32 adds of (b)f16-exact values;
    halving is exact). Structural zeros survive ((0 + 0) / 2 = 0)."""
    for r in range(rows):
        a = x_ref[0, :, 2 * r * ts:(2 * r + 1) * ts].astype(jnp.float32)
        b = x_ref[0, :, (2 * r + 1) * ts:(2 * r + 2) * ts].astype(
            jnp.float32)
        y_ref[0, :, r * ts:(r + 1) * ts] = ((a + b) * 0.5).astype(
            y_ref.dtype)


def _avg_bwd_kernel(g_ref, dx_ref, *, rows, ts):
    """d(mean)/dx routes gy/2 to both rows (linear; no compares)."""
    for r in range(rows):
        gy = g_ref[0, :, r * ts:(r + 1) * ts].astype(jnp.float32) * 0.5
        dx_ref[0, :, 2 * r * ts:(2 * r + 1) * ts] = gy.astype(
            dx_ref.dtype)
        dx_ref[0, :, (2 * r + 1) * ts:(2 * r + 2) * ts] = gy.astype(
            dx_ref.dtype)


def _cblock_aligned(c, per_channel_bytes):
    """Largest 8-aligned channel block whose footprint fits the 6 MB
    pool-kernel budget (same alignment discipline as _pool_cblock)."""
    budget = 6 * 1024 * 1024
    cb = c
    while cb > 8 and cb % 2 == 0 and (cb // 2) % 8 == 0 \
            and per_channel_bytes * cb > budget:
        cb //= 2
    return cb


def _avg_fwd(x2, f_out, ts, interpret):
    bsz, c, ls = x2.shape
    assert ls == 2 * f_out * ts, (x2.shape, f_out, ts)
    per = (2 * x2.dtype.itemsize + 4) * f_out * ts * 2  # dbl-buffered
    cb = _cblock_aligned(c, per)
    kernel = functools.partial(_avg_fwd_kernel, rows=f_out, ts=ts)
    return pl.pallas_call(
        kernel,
        grid=(bsz, c // cb),
        in_specs=[pl.BlockSpec((1, cb, ls), lambda bi, ci: (bi, ci, 0))],
        out_specs=pl.BlockSpec((1, cb, f_out * ts),
                               lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, c, f_out * ts),
                                       jnp.float32),
        interpret=interpret,
    )(x2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def avgpool2_rows_packed(x2, f_out, ts, interpret=False):
    """(2, 1)-AVG-pool on the freq-major packed layout, f32 output:
    x2 (B, C, 2*f_out*ts) -> (B, C, f_out*ts).

    Used by the packed-residual row matcher
    (cnn.py:_match_residual_packed) for residual skips that cross a
    (2, 1) freq pool. The previous reshape -> reduce -> broadcast
    lowering materialized 5-D T(2,128)-tiled intermediates (4x sublane
    padding): measured ~1.7 ms per crossing residual on the deep
    recipe at bs=16 (round-5 trace, PERFORMANCE.md). One kernel pass
    each way replaces the chain while computing the exact same f32
    values."""
    return _avg_fwd(x2, f_out, ts, interpret)


def _avg_vjp_fwd(x2, f_out, ts, interpret):
    # residual: a zero-length slice carries the primal dtype/channel
    # count without keeping the buffer alive
    return _avg_fwd(x2, f_out, ts, interpret), x2[:0]


def _avg_vjp_bwd(f_out, ts, interpret, res, gy):
    bsz = gy.shape[0]
    c, ls = res.shape[1], res.shape[2]
    per = (4 + 2 * res.dtype.itemsize) * f_out * ts * 2
    cb = _cblock_aligned(c, per)
    kernel = functools.partial(_avg_bwd_kernel, rows=f_out, ts=ts)
    dx = pl.pallas_call(
        kernel,
        grid=(bsz, c // cb),
        in_specs=[pl.BlockSpec((1, cb, f_out * ts),
                               lambda bi, ci: (bi, ci, 0))],
        out_specs=pl.BlockSpec((1, cb, ls), lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, c, ls), res.dtype),
        interpret=interpret,
    )(gy.astype(jnp.float32))
    return (dx,)


avgpool2_rows_packed.defvjp(_avg_vjp_fwd, _avg_vjp_bwd)
