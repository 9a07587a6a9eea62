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
is numerically identical to the ``lax.scan`` path in ops/rnn.py (same
torch gate ordering) and ``StackedGRU(use_pallas=True)`` selects it for
the forward/inference path. Training: a ``jax.custom_vjp`` recomputes
the forward with the scan path in the backward pass (the kernel itself
has no hand-written VJP), so gradients flow but the speedup applies to
forward-only workloads (ensemble inference, sliding-window SED).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts (tests run CPU)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _gru_kernel(xw_ref, w_hh_ref, b_hh_ref, h0_ref, y_ref, h_scratch, *,
                t_block, hidden):
    """One (direction, batch-block, time-block) grid step."""
    t_idx = pl.program_id(2)

    @pl.when(t_idx == 0)
    def _init():
        h_scratch[:] = h0_ref[0]

    w_hh = w_hh_ref[0]
    b_hh = b_hh_ref[0]

    def body(t, h):
        xw_t = xw_ref[0, :, t, :]  # (B_blk, 3H)
        hw = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
        xr = xw_t[:, :hidden]
        xz = xw_t[:, hidden:2 * hidden]
        xn = xw_t[:, 2 * hidden:]
        hr = hw[:, :hidden]
        hz = hw[:, hidden:2 * hidden]
        hn = hw[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1. - z) * n + z * h
        y_ref[0, :, t, :] = h_new
        return h_new

    h_scratch[:] = jax.lax.fori_loop(0, t_block, body, h_scratch[:])


def _gru_scan_pallas(xw, w_hh, b_hh, h0, interpret=False,
                     block_b=32, block_t=64):
    d, b, t, three_h = xw.shape
    h = three_h // 3
    block_b = min(block_b, b)
    block_t = min(block_t, t)
    # time must tile exactly: pad with zeros (outputs trimmed below);
    # padded steps still update h but their y is discarded and the
    # caller masks sequence ends anyway
    t_pad = (-t) % block_t
    if t_pad:
        xw = jnp.pad(xw, ((0, 0), (0, 0), (0, t_pad), (0, 0)))
    tt = t + t_pad
    grid = (d, pl.cdiv(b, block_b), tt // block_t)
    kernel = functools.partial(
        _gru_kernel, t_block=block_t, hidden=h)
    in_specs = [
        pl.BlockSpec((1, block_b, block_t, three_h),
                     lambda di, bi, ti: (di, bi, ti, 0)),
        pl.BlockSpec((1, h, three_h), lambda di, bi, ti: (di, 0, 0)),
        pl.BlockSpec((1, 1, three_h), lambda di, bi, ti: (di, 0, 0)),
        pl.BlockSpec((1, block_b, h), lambda di, bi, ti: (di, bi, 0)),
    ]
    out_specs = pl.BlockSpec(
        (1, block_b, block_t, h), lambda di, bi, ti: (di, bi, ti, 0))
    if pltpu is None:  # pragma: no cover
        raise RuntimeError(
            'pallas TPU support unavailable; use StackedGRU with '
            'use_pallas=False')
    scratch = [pltpu.VMEM((block_b, h), jnp.float32)]
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((d, b, tt, h), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xw.astype(jnp.float32), w_hh.astype(jnp.float32),
      b_hh.reshape(d, 1, three_h).astype(jnp.float32),
      h0.astype(jnp.float32))
    return y[:, :, :t, :]


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
    y = _gru_scan_pallas(xw, w_hh, b_hh, h0, interpret=interpret)
    return y, (xw, w_hh, b_hh, h0)


def _gru_scan_bwd(interpret, res, g):
    # backward = autodiff of the scan path (recomputes the forward);
    # keeps training correct while the kernel speeds up forward-only
    # workloads
    xw, w_hh, b_hh, h0 = res
    _, vjp = jax.vjp(_gru_scan_reference_d, xw, w_hh, b_hh, h0)
    return vjp(g)


gru_scan.defvjp(_gru_scan_fwd, _gru_scan_bwd)
