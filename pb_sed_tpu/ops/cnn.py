"""CNN stacks: masked-norm 2-D + 1-D convolutional towers.

Capability parity with padertorch ``contrib.je.modules.hybrid.CNN`` (=
``CNN2d`` stack + flatten + ``CNN1d`` stack) as configured by the reference
(``experiments/weak_label_crnn/training.py:158-185,218-242``): per-layer
``out_channels`` / ``kernel_size`` / ``pool_size`` lists, residual
connection index lists, masked batch norm with eps, pre-activation ReLU,
dropout, ``output_layer`` flag, ``input_height``, tag conditioning via
``conditional_dims``, and layer freezing for transfer learning (handled in
the trainer via parameter-label masks, see train/trainer.py).

TPU-first notes: data layout is (B, T, F, C) / (B, T, C) so convolutions
lower to MXU-friendly NHWC convs; batch-norm statistics are computed with
explicit sequence masks (padded batches must not pollute the running
stats); the reference's "(2, 1) pool" notation (freq x time in its (B, C,
F, T) layout) is preserved in configs and mapped to our layout internally.
"""
from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from pb_sed_tpu.ops.masking import sequence_mask
from pb_sed_tpu.utils.config import Configurable
from pb_sed_tpu.utils.misc import to_list


class Conv2dMXU(nn.Module):
    """Drop-in for ``nn.Conv`` (same param tree: kernel (kt, kf, Cin,
    Cout) + bias) that routes odd-kernel stride-1 SAME convs through the
    Pallas im2col-GEMM kernels (ops/pallas/conv.py) on TPU.

    XLA's own lowering of the sub-128-channel NHWC convs in this tower
    runs at 12-25% lane fill (measured — see the conv kernel docstring);
    the Pallas path packs (F, C) into one dense minor dim and contracts
    K = kt*kf*Cin on the MXU. Off-TPU (or ``use_pallas=False``) falls
    back to the exact flax bf16 conv path. Gating mirrors the GRU
    kernels (ops/rnn.py:set_pallas_mode)."""
    features: int
    kernel_size: tuple
    compute_dtype: Any = jnp.bfloat16
    use_pallas: bool = False
    param_cin: int = None   # real Cin when the packed input is
    #                         channel-padded (entry layer, see
    #                         CNN2d._packed_forward) — keeps the param
    #                         tree checkpoint-compatible

    @nn.compact
    def __call__(self, x, packed=None):
        """``packed``: a freq-major ConvGeom — then ``x`` is the packed
        (B, Cin, Ls) buffer of the tower path and the conv runs as the
        Pallas packed kernel (no relayout; see CNN2d._packed_forward)."""
        kt, kf = self.kernel_size
        cin = x.shape[1] if packed is not None else x.shape[-1]
        if self.param_cin is not None:
            cin = self.param_cin
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (kt, kf, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,))
        if packed is not None:
            from pb_sed_tpu.ops.pallas.conv import conv2d_packed_fm
            from pb_sed_tpu.ops.rnn import _pallas_enabled
            _, interpret = _pallas_enabled()
            w = kernel
            if packed is not None and x.shape[1] > cin:
                # zero-padded input channels contribute exactly zero;
                # autodiff slices dw back to the real channels via the
                # pad transpose
                w = jnp.pad(
                    kernel, ((0, 0), (0, 0), (0, x.shape[1] - cin),
                             (0, 0)))
            return conv2d_packed_fm(x, w, bias, packed, interpret)
        if self.use_pallas and kt % 2 == 1 and kf % 2 == 1 \
                and kt * kf > 1:
            from pb_sed_tpu.ops.pallas.conv import conv2d_mxu, pltpu
            from pb_sed_tpu.ops.rnn import _pallas_enabled
            enabled, interpret = _pallas_enabled()
            if enabled and pltpu is not None:
                return conv2d_mxu(x, kernel, bias, interpret)
        y = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias.astype(self.compute_dtype)


class MaskedBatchNorm(nn.Module):
    """Batch norm whose statistics only see valid frames.

    Normalizes per channel over batch x valid-time (x freq for 4-D input).
    """
    eps: float = 1e-3
    momentum: float = 0.95

    @nn.compact
    def __call__(self, x, seq_len, training=False, packed_mask=None):
        """``packed_mask``: (B, 1, L) valid-lane mask — then ``x`` is a
        freq-major packed (B, C, L) buffer (channels on dim 1) and the
        statistics are computed over (batch, lanes) with the mask; the
        variable/param tree is identical to the unpacked path, so
        checkpoints are interchangeable."""
        packed = packed_mask is not None
        c = x.shape[1] if packed else x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,)))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones((c,)))
        initialized = self.variable('batch_stats', 'initialized',
                                    lambda: jnp.zeros(()))
        gamma = self.param('scale', nn.initializers.ones, (c,))
        beta = self.param('shift', nn.initializers.zeros, (c,))
        if packed:
            xf = x.astype(jnp.float32)
            m = packed_mask.astype(jnp.float32)
            if training:
                count = jnp.maximum(m.sum(), 1.)
                mean = (xf * m).sum((0, 2)) / count
                var = (jnp.square(xf - mean[:, None]) * m).sum(
                    (0, 2)) / count
                momentum = jnp.where(
                    initialized.value > 0, self.momentum, 0.)
                ra_mean.value = (momentum * ra_mean.value
                                 + (1 - momentum) * mean)
                ra_var.value = (momentum * ra_var.value
                                + (1 - momentum) * var)
                initialized.value = jnp.ones(())
            else:
                mean = ra_mean.value
                var = ra_var.value
            rs = jax.lax.rsqrt(var + self.eps)
            return ((xf - mean[:, None]) * (rs * gamma)[:, None]
                    + beta[:, None])
        mask = sequence_mask(seq_len, x.shape[1])  # (B, T)
        mask = mask.reshape(mask.shape + (1,) * (x.ndim - 2))
        if training:
            axes = tuple(range(x.ndim - 1))
            count = jnp.maximum((mask * jnp.ones_like(x)).sum(axes), 1.)
            mean = (x * mask).sum(axes) / count
            var = (jnp.square(x - mean) * mask).sum(axes) / count
            momentum = jnp.where(initialized.value > 0, self.momentum, 0.)
            ra_mean.value = momentum * ra_mean.value + (1 - momentum) * mean
            ra_var.value = momentum * ra_var.value + (1 - momentum) * var
            initialized.value = jnp.ones(())
        else:
            mean = ra_mean.value
            var = ra_var.value
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


def _act(name):
    if name in (None, 'identity', 'linear'):
        return lambda x: x
    return getattr(nn, name)


def _dtype(name):
    if name in (None, 'float32'):
        return jnp.float32
    return jnp.dtype(name)


def _pool_fp_tp(pool):
    """Reference pool notation -> (freq_pool, time_pool) ints."""
    if isinstance(pool, (tuple, list)):
        pf, pt = pool
    else:
        pf = pt = pool
    return int(pf), int(pt)


def _pool2d(x, pool):
    """Pool with reference notation: pool = (freq, time) or scalar.

    Measured note (round 3): rewriting non-overlapping pools as
    reshape+max to dodge the select-and-scatter gradient made the
    train step SLOWER (48.4 -> 58.9 ms device) — splitting the tiled
    minor dims forces relayout copies that cost more than the
    select-and-scatter saves. nn.max_pool stays.
    """
    if isinstance(pool, (tuple, list)):
        pf, pt = pool
    else:
        pf = pt = pool
    if pf == 1 and pt == 1:
        return x
    # x: (B, T, F, C); reference pools are max pools
    return nn.max_pool(x, window_shape=(pt, pf), strides=(pt, pf))


def _match_residual(res, x):
    """Adapt a saved residual to ``x``: average-pool mismatched T/F dims
    and zero-pad grown channel counts (identity skips across the deep
    config's channel-doubling boundaries, reference residual lists at
    ``training.py:171-178``)."""
    if res.shape == x.shape:
        return res
    if res.ndim == 4:
        st = res.shape[1] // x.shape[1] or 1
        sf = res.shape[2] // x.shape[2] or 1
        if st > 1 or sf > 1:
            res = nn.avg_pool(res, window_shape=(st, sf),
                              strides=(st, sf))
    else:
        st = res.shape[1] // x.shape[1] or 1
        if st > 1:
            res = nn.avg_pool(res, window_shape=(st,), strides=(st,))
    grow = x.shape[-1] - res.shape[-1]
    assert grow >= 0, (res.shape, x.shape)
    if grow:
        width = [(0, 0)] * (res.ndim - 1) + [(0, grow)]
        res = jnp.pad(res, width)
    return res


class CNN2d(nn.Module, Configurable):
    """Stack of 2-D convolutions over (time, freq).

    ``compute_dtype='bfloat16'`` runs the convolutions in bf16 on the MXU
    (params and norm statistics stay float32).
    """
    out_channels: Sequence[int]
    kernel_size: Union[int, Sequence[int]] = 3
    pool_size: Union[int, Sequence[Any]] = 1
    residual_connections: Sequence[Any] = None
    norm: str = 'batch'
    norm_kwargs: dict = None
    activation_fn: str = 'relu'
    pre_activation: bool = False
    dropout: float = 0.
    output_layer: bool = False
    compute_dtype: str = 'bfloat16'
    use_pallas: bool = False     # Pallas im2col-GEMM convs (TPU-gated)
    in_channels: int = None      # informational (finalize glue)
    input_height: int = None     # informational

    def _packed_plan(self, x, kernels, pools, residuals):
        """Freq-major packed-tower plan: (pack_at, {i: geom}, interpret,
        entry_pad) or None when the configuration or backend requires
        the unpacked XLA path. Supported from the pack layer on: batch
        norm, dropout 0, no residuals, odd >1x1 kernels, 16-multiple
        channels, freq-only pools in {1, 2} and a shared lane stride.
        The ENTRY layer may additionally have Cin < 16 (the cin=1
        feature lift): its input is zero-padded to 16 channels AFTER
        packing (entry_pad), which keeps the big relayout on the tiny
        pre-lift buffer."""
        if not self.use_pallas or x.ndim != 4:
            return None
        from pb_sed_tpu.ops.pallas import conv as pconv
        from pb_sed_tpu.ops.rnn import _pallas_enabled
        enabled, interpret = _pallas_enabled()
        if not enabled or pconv.pltpu is None:
            return None
        from pb_sed_tpu.ops.fallback import note_fallback
        if self.norm != 'batch' or self.dropout > 0:
            note_fallback(
                'the packed Pallas conv tower',
                f'norm={self.norm!r}/dropout={self.dropout} — the tower '
                f'packs batch-norm towers without dropout only')
            return None
        if any(r is not None for r in residuals):
            note_fallback(
                'the packed Pallas conv tower',
                'residual_connections configured — the packed layout '
                'does not carry residual skips yet')
            return None
        n = len(self.out_channels)
        t, f, cin = x.shape[1], x.shape[2], x.shape[3]
        pack_at = None
        geoms = {}
        ts = None
        entry_pad = False
        for i in range(n):
            k = kernels[i]
            kt, kf = (k, k) if not isinstance(k, (tuple, list)) else k
            pf_, pt_ = _pool_fp_tp(pools[i])
            cout = self.out_channels[i]
            pad_here = pack_at is None and 0 < cin < 16
            cin_eff = 16 if pad_here else cin
            ok = (
                kt % 2 == 1 and kf % 2 == 1 and kt * kf > 1
                and cin_eff % 16 == 0 and cout % 16 == 0
                and pt_ == 1 and pf_ in (1, 2)
                and (pf_ == 1 or f % 2 == 0)
                and pconv.fm_supported(t, f, kt, kf, max(cin_eff, cout))
            )
            if ok:
                g = pconv.fm_geom(t, f, kt, kf, max(cin_eff, cout))
                ok = ts is None or g.fs == ts
            if ok:
                if pack_at is None:
                    pack_at = i
                    ts = g.fs
                    entry_pad = pad_here
                geoms[i] = g
            else:
                # only a fully packed SUFFIX is supported (one
                # pack/unpack boundary): a violation restarts the scan
                # so the plan keeps the LAST contiguous packable run
                pack_at, ts, entry_pad, geoms = None, None, False, {}
            cin = cout
            f = -(-f // pf_)
            t = -(-t // pt_)
        if pack_at is None or n - pack_at < 2:
            note_fallback(
                'the packed Pallas conv tower',
                'no packable layer suffix of length >= 2 (needs odd '
                '>1x1 kernels, 16-multiple channels, freq-only pools '
                'in {1, 2} and a shared lane stride)')
            return None
        return pack_at, geoms, interpret, entry_pad

    def _packed_forward(self, x, seq_len, training, plan, kernels,
                        pools):
        """Freq-major packed tower: pack once after the unpacked prefix,
        run BN -> act -> conv -> pool on the packed (B, C, Ls) layout
        (re-masking structural slots after every affine shift), unpack
        once. Param/variable tree is identical to the unpacked path.

        The entry layer's BN/act run unpacked when its input is
        channel-padded (entry_pad: BN's param size is the REAL channel
        count, which a packed-BN would mis-size), and the pack relayout
        runs on the pre-pad buffer (16x smaller at cin=1) with the zero
        channels appended afterwards."""
        from pb_sed_tpu.ops.pallas import conv as pconv
        pack_at, geoms, interpret, entry_pad = plan
        act = _act(self.activation_fn)
        norm_kwargs = self.norm_kwargs or {}
        n = len(self.out_channels)
        for i in range(pack_at):  # unpacked prefix (no residuals by plan)
            is_output = self.output_layer and i == n - 1
            h = x
            if self.pre_activation and not is_output:
                h = MaskedBatchNorm(**norm_kwargs, name=f'norm_{i}')(
                    h, seq_len, training)
                h = act(h)
            k = kernels[i]
            kt, kf = (k, k) if not isinstance(k, (tuple, list)) else k
            h = Conv2dMXU(self.out_channels[i], kernel_size=(kt, kf),
                          name=f'conv_{i}',
                          compute_dtype=_dtype(self.compute_dtype),
                          use_pallas=False)(h)
            if not (self.pre_activation and i == pack_at - 1):
                # the pack consumes bf16 — skip the f32 relayout when
                # nothing float32 (BN/residual) reads the conv output
                h = h.astype(jnp.float32)
            if not self.pre_activation and not is_output:
                h = MaskedBatchNorm(**norm_kwargs, name=f'norm_{i}')(
                    h, seq_len, training)
                h = act(h)
            h = _pool2d(h, pools[i])
            _, pt_ = _pool_fp_tp(pools[i])
            if pt_ > 1:
                seq_len = -(-seq_len // pt_)
            x = h
        g = geoms[pack_at]
        cin_entry = x.shape[-1]
        if entry_pad and self.pre_activation:
            # entry BN/act on the thin unpacked input (param size = the
            # real channel count; the buffer is 16x smaller than the
            # packed one it feeds)
            h = MaskedBatchNorm(**norm_kwargs, name=f'norm_{pack_at}')(
                x, seq_len, training)
            x = act(h)
        x2 = pconv.pack_fm(x, g)
        if entry_pad:
            x2 = jnp.pad(x2, ((0, 0), (0, 16 - cin_entry), (0, 0)))
        f_rows = g.t
        for i in range(pack_at, n):
            g = geoms[i]
            assert g.t == f_rows, (g, f_rows)
            is_output = self.output_layer and i == n - 1
            if not is_output:
                struct = pconv.lane_mask(g, jnp.float32)
                valid = pconv.fm_valid_mask(g, seq_len)
            if self.pre_activation and not is_output \
                    and not (entry_pad and i == pack_at):
                h = MaskedBatchNorm(**norm_kwargs, name=f'norm_{i}')(
                    x2, seq_len, training, packed_mask=valid)
                x2 = (act(h) * struct).astype(jnp.bfloat16)
            k = kernels[i]
            kt, kf = (k, k) if not isinstance(k, (tuple, list)) else k
            x2 = Conv2dMXU(self.out_channels[i], kernel_size=(kt, kf),
                           name=f'conv_{i}',
                           compute_dtype=_dtype(self.compute_dtype),
                           use_pallas=True,
                           param_cin=(cin_entry if entry_pad
                                      and i == pack_at else None)
                           )(x2, packed=g)
            if not self.pre_activation and not is_output:
                h = MaskedBatchNorm(**norm_kwargs, name=f'norm_{i}')(
                    x2, seq_len, training, packed_mask=valid)
                x2 = (act(h) * struct).astype(jnp.bfloat16)
            pf_, _ = _pool_fp_tp(pools[i])
            if pf_ == 2:
                f_rows //= 2
                x2 = pconv.maxpool2_rows_packed(
                    x2, f_rows, g.fs, interpret)
        gl = geoms[n - 1]
        g_out = pconv.ConvGeom(
            t=f_rows, f=gl.f, kt=gl.kt, kf=gl.kf, tc=1, tp=f_rows,
            fs=gl.fs, ls=f_rows * gl.fs)
        return pconv.unpack_fm(x2, g_out, jnp.float32), seq_len

    @nn.compact
    def __call__(self, x, seq_len, training=False):
        n = len(self.out_channels)
        kernels = to_list(self.kernel_size, n)
        pools = to_list(
            list(self.pool_size) if isinstance(self.pool_size, (list, tuple))
            and len(self.pool_size) == n else self.pool_size, n)
        residuals = to_list(
            self.residual_connections if self.residual_connections
            else None, n)
        plan = self._packed_plan(x, kernels, pools, residuals)
        if plan is not None:
            return self._packed_forward(
                x, seq_len, training, plan, kernels, pools)
        act = _act(self.activation_fn)
        norm_kwargs = self.norm_kwargs or {}
        pending = {}
        for i in range(n):
            is_output = self.output_layer and i == n - 1
            h = x
            if self.pre_activation and not is_output:
                if self.norm == 'batch':
                    h = MaskedBatchNorm(
                        **norm_kwargs, name=f'norm_{i}')(
                            h, seq_len, training)
                h = act(h)
                if self.dropout > 0 and training:
                    h = nn.Dropout(self.dropout, deterministic=False)(h)
            k = kernels[i]
            kt, kf = (k, k) if not isinstance(k, (tuple, list)) else k
            h = Conv2dMXU(self.out_channels[i], kernel_size=(kt, kf),
                          name=f'conv_{i}',
                          compute_dtype=_dtype(self.compute_dtype),
                          use_pallas=self.use_pallas)(h)
            h = h.astype(jnp.float32)
            if not self.pre_activation and not is_output:
                if self.norm == 'batch':
                    h = MaskedBatchNorm(
                        **norm_kwargs, name=f'norm_{i}')(
                            h, seq_len, training)
                h = act(h)
                if self.dropout > 0 and training:
                    h = nn.Dropout(self.dropout, deterministic=False)(h)
            if i in pending:
                for res in pending.pop(i):
                    h = h + _match_residual(res, h)
            if residuals[i] is not None:
                pending.setdefault(int(residuals[i]), []).append(h)
            pool = pools[i]
            h = _pool2d(h, pool)
            if isinstance(pool, (tuple, list)):
                pt = pool[1]
            else:
                pt = pool
            if pt > 1:
                seq_len = -(-seq_len // pt)
            x = h
        return x, seq_len


class CNN1d(nn.Module, Configurable):
    """Stack of 1-D convolutions over time ((B, T, C) layout)."""
    out_channels: Sequence[int]
    kernel_size: Union[int, Sequence[int]] = 3
    pool_size: Union[int, Sequence[int]] = 1
    residual_connections: Sequence[Any] = None
    norm: str = 'batch'
    norm_kwargs: dict = None
    activation_fn: str = 'relu'
    pre_activation: bool = False
    dropout: float = 0.
    output_layer: bool = False
    compute_dtype: str = 'bfloat16'
    in_channels: int = None  # informational

    @nn.compact
    def __call__(self, x, seq_len, training=False):
        n = len(self.out_channels)
        kernels = to_list(
            list(self.kernel_size) if isinstance(
                self.kernel_size, (list, tuple)) else self.kernel_size, n)
        pools = to_list(self.pool_size, n)
        residuals = to_list(
            self.residual_connections if self.residual_connections
            else None, n)
        act = _act(self.activation_fn)
        norm_kwargs = self.norm_kwargs or {}
        pending = {}
        for i in range(n):
            is_output = self.output_layer and i == n - 1
            h = x
            if self.pre_activation and not is_output:
                if self.norm == 'batch':
                    h = MaskedBatchNorm(
                        **norm_kwargs, name=f'norm_{i}')(
                            h, seq_len, training)
                h = act(h)
                if self.dropout > 0 and training:
                    h = nn.Dropout(self.dropout, deterministic=False)(h)
            h = nn.Conv(self.out_channels[i], kernel_size=(kernels[i],),
                        padding='SAME', name=f'conv_{i}',
                        dtype=_dtype(self.compute_dtype))(h)
            h = h.astype(jnp.float32)
            if not self.pre_activation and not is_output:
                if self.norm == 'batch':
                    h = MaskedBatchNorm(
                        **norm_kwargs, name=f'norm_{i}')(
                            h, seq_len, training)
                h = act(h)
                if self.dropout > 0 and training:
                    h = nn.Dropout(self.dropout, deterministic=False)(h)
            if i in pending:
                for res in pending.pop(i):
                    h = h + _match_residual(res, h)
            if residuals[i] is not None:
                pending.setdefault(int(residuals[i]), []).append(h)
            if pools[i] > 1:
                h = nn.max_pool(h, window_shape=(pools[i],),
                                strides=(pools[i],))
                seq_len = -(-seq_len // pools[i])
            x = h
        return x, seq_len


class CNN(nn.Module, Configurable):
    """2-D tower -> flatten freq into channels -> 1-D tower.

    Mirrors the reference hybrid CNN: input (B, T, F) features are lifted to
    (B, T, F, C=1[+cond]) for the 2-D stack; the surviving freq bins are
    folded into channels for the 1-D stack. Output is (B, T, C_1d).
    """
    cnn_2d: dict
    cnn_1d: dict
    input_height: int = None
    positional_encoding: bool = False
    conditional_dims: int = 0

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['cnn_2d'] = {'factory': CNN2d}
        config['cnn_1d'] = {'factory': CNN1d}

    def setup(self):
        def build(spec, cls):
            if isinstance(spec, cls):
                return spec
            cfg = dict(spec)
            cfg.pop('factory', None)
            return cls(**cfg)

        self.tower_2d = build(self.cnn_2d, CNN2d)
        self.tower_1d = build(self.cnn_1d, CNN1d)

    def __call__(self, x, seq_len, condition=None, training=False):
        """
        Args:
            x: (B, T, F) features, or (B, T, F, C) with delta channels
                (``NormalizedLogMelExtractor.add_deltas``).
            seq_len: (B,) valid frames.
            condition: optional (B, K) conditioning vector (tag condition,
                reference ``strong_label/crnn.py:85-86``).
        Returns: (B, T, C) embedding, updated seq_len.
        """
        h = x[..., None] if x.ndim == 3 else x  # (B, T, F, C)
        b, t, f = h.shape[:3]
        if self.positional_encoding:
            pos = jnp.linspace(-1., 1., f).reshape(1, 1, f, 1)
            h = jnp.concatenate(
                [h, jnp.broadcast_to(pos, (b, t, f, 1))], axis=-1)
        if self.conditional_dims and condition is not None:
            cond = jnp.broadcast_to(
                condition[:, None, None, :], (b, t, f, condition.shape[-1]))
            h = jnp.concatenate([h, cond], axis=-1)
        h, seq_len = self.tower_2d(h, seq_len, training=training)
        b, t2, f2, c2 = h.shape
        h = h.reshape(b, t2, f2 * c2)
        h, seq_len = self.tower_1d(h, seq_len, training=training)
        return h, seq_len
