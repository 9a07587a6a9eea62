"""Sequence masks and masked reductions.

Device-side (JAX) equivalents of the reference's sequence ops
(padertorch ``compute_mask`` at ``pb_sed/models/weak_label/crnn.py:238`` and
``reduce.{TakeLast,Mean,Sum,Max}`` at ``crnn.py:147,158,185``). Everything
here is shape-static and mask-driven, as required under jit: padded batches
never influence losses, statistics or pooled outputs.
"""
import functools

import jax
import jax.numpy as jnp


def sequence_mask(seq_len, max_len, dtype=jnp.float32):
    """(B,) lengths -> (B, max_len) {0,1} mask."""
    return (
        jnp.arange(max_len)[None, :] < seq_len[:, None]
    ).astype(dtype)


def compute_mask(x, seq_len, sequence_axis=-1, batch_axis=0):
    """Mask broadcastable to ``x`` with 1s on valid frames."""
    axis = sequence_axis % x.ndim
    mask = sequence_mask(seq_len, x.shape[axis], x.dtype)  # (B, T)
    shape = [1] * x.ndim
    shape[batch_axis % x.ndim] = x.shape[batch_axis % x.ndim]
    shape[axis] = x.shape[axis]
    return mask.reshape(shape)


def masked_mean(x, seq_len, axis=-1, keepdims=False):
    mask = compute_mask(x, seq_len, sequence_axis=axis)
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.)


def masked_sum(x, seq_len, axis=-1, keepdims=False):
    mask = compute_mask(x, seq_len, sequence_axis=axis)
    return jnp.sum(x * mask, axis=axis, keepdims=keepdims)


def masked_max(x, seq_len, axis=-1, keepdims=False):
    mask = compute_mask(x, seq_len, sequence_axis=axis)
    neg = jnp.finfo(x.dtype).min
    return jnp.max(jnp.where(mask > 0, x, neg), axis=axis, keepdims=keepdims)


def take_last(x, seq_len, axis=-1, keepdims=False):
    """Value at the last valid frame per example (reference ``TakeLast``)."""
    axis = axis % x.ndim
    idx = jnp.clip(seq_len - 1, 0, x.shape[axis] - 1)  # (B,)
    idx_shape = [1] * x.ndim
    idx_shape[0] = x.shape[0]
    idx = idx.reshape(idx_shape)
    idx = jnp.broadcast_to(
        idx, x.shape[:axis] + (1,) + x.shape[axis + 1:])
    out = jnp.take_along_axis(x, idx, axis=axis)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def reverse_sequence(x, seq_len, axis=-1):
    """Flip valid frames, keeping padding at the end.

    ``reverse_sequence(x, sl)[..., t] == x[..., sl - 1 - t]`` for t < sl.
    Needed for the backward GRU head over padded batches.

    ``seq_len=None`` means every sequence is full: the masked reversal
    degenerates to a plain ``jnp.flip`` (no roll, no doubled-buffer
    copies — those dominated the sliding-window ensemble trace).

    TPU-critical implementation note: the obvious
    ``take_along_axis(flip(x), src)`` broadcasts the index to the FULL
    tensor, which XLA-TPU lowers to sort-based gather/scatter — measured
    ~50 ms forward + ~36 ms backward per call at (32, 500, 256), which
    dominated the whole FBCRNN train step (the backward head calls this
    4x per step). Instead: flip (free, layout-only) + per-example
    circular roll via batched dynamic slices of a doubled buffer. And
    because flip-then-roll is a SYMMETRIC permutation (P^T == P — the
    op is an involution), the VJP is the op itself applied to the
    cotangent, so the backward pass never sees a scatter at all.
    """
    axis = axis % x.ndim
    if seq_len is None:
        return jnp.flip(x, axis=axis)
    t = x.shape[axis]
    offsets = (t - seq_len) % jnp.maximum(t, 1)  # (B,)
    return _flip_roll(x, offsets, axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _flip_roll(x, offsets, axis):
    """flip along ``axis`` then roll example b LEFT by ``offsets[b]``."""
    return _flip_roll_impl(x, offsets, axis)


# the (B, T, T) one-hot roll operator is O(T^2) memory — past this the
# doubled-buffer dynamic-slice path wins on footprint
_ONEHOT_ROLL_MAX_T = 1024


def _use_onehot_roll(t, axis, ndim):
    """Whether the roll runs as a one-hot MXU matmul (tests monkeypatch
    this to pin parity of the two paths off-TPU)."""
    return (axis == 1 and ndim >= 2 and t <= _ONEHOT_ROLL_MAX_T
            and jax.default_backend() == 'tpu')


def _flip_roll_impl(x, offsets, axis):
    t = x.shape[axis]
    flipped = jnp.flip(x, axis=axis)
    if _use_onehot_roll(t, axis, x.ndim):
        # one-hot MXU roll: XLA lowers the vmapped per-example dynamic
        # slice below to a SERIAL while loop over the batch (measured
        # 0.84 ms fwd+grad at (32, 500, 256)); the batched permutation
        # matmul y[b, i] = sum_j R[b, i, j] x[b, j] runs on the MXU in
        # 0.16 ms. Precision HIGHEST keeps it BIT-exact: each output
        # row has exactly one nonzero product and the full-f32
        # emulation reconstructs the operand exactly (HIGH/default
        # quantize x to bf16 — measured 1.5e-2 / 6e-5 errors).
        i = jnp.arange(t)
        src = (i[None, :] + offsets[:, None]) % jnp.maximum(t, 1)
        r = (src[:, :, None] == i[None, None, :]).astype(jnp.float32)
        flat = flipped.reshape(flipped.shape[0], t, -1)
        y = jnp.einsum('bij,bjc->bic', r, flat.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        return y.reshape(flipped.shape).astype(x.dtype)

    # batch on axis 0 (all callers), roll axis = axis-1 inside the map
    def roll_one(xb, off):
        doubled = jnp.concatenate([xb, xb], axis=axis - 1)
        return jax.lax.dynamic_slice_in_dim(doubled, off, t, axis=axis - 1)
    return jax.vmap(roll_one)(flipped, offsets)


def _flip_roll_fwd(x, offsets, axis):
    return _flip_roll_impl(x, offsets, axis), offsets


def _flip_roll_bwd(axis, offsets, g):
    # involution: P^T == P, so the cotangent transforms by the same
    # cheap flip+roll instead of a (sort-lowered) scatter
    import numpy as np
    return (_flip_roll_impl(g, offsets, axis),
            np.zeros(offsets.shape, dtype=jax.dtypes.float0))


_flip_roll.defvjp(_flip_roll_fwd, _flip_roll_bwd)
