"""Analytic per-layer fill-model roofline for the DEEP (width-2) recipe.

Same methodology as the shallow table in PERFORMANCE.md "Roofline":
convs are modeled as MXU matmuls with 128-wide contraction (K) and
lane (N) fill factors — fwd K=kt*kf*Cin, N=Cout; dx K=kt*kf*Cout,
N=Cin; dw N=Cout — crediting perfect spatial streaming and charging
only tile under-fill against the v5e bf16 peak (197 TFLOP/s). GRU is
entered at its MEASURED kernel spans (the recurrence is latency-, not
FLOP-bound); BN/aug/loss are HBM terms at 819 GB/s.

Prints the markdown table for PERFORMANCE.md "Deep recipe roofline".
Run: python scripts/perf/deep_roofline.py  (pure host arithmetic).
"""
import math

PEAK_TFLOPS = 197.
HBM_GBPS = 819.

B, T, MELS = 16, 500, 128


def fill(n):
    """Tile fill factor of an n-wide matmul dim against 128 tiles."""
    return n / (128. * math.ceil(n / 128.))


def conv_ms(b, t, f, cin, cout, kt, kf, mode):
    """Fill-modeled attainable ms for one conv pass on the MXU."""
    k = kt * kf * cin
    flops = 2. * b * t * f * k * cout
    if mode == 'fwd':
        eff = fill(k) * fill(cout)
    elif mode == 'dx':
        kg = kt * kf * cout
        flops = 2. * b * t * f * kg * cin
        eff = fill(kg) * fill(cin)
    elif mode == 'dw':
        # contraction over B*T*F (large, full fill); lanes = Cout
        eff = fill(cout)
    else:
        raise ValueError(mode)
    return flops / 1e9, flops / (PEAK_TFLOPS * 1e12 * eff) * 1e3


def deep_layers():
    """(name, cin, cout, kt, kf, f_in) for the deep conv2d tower +
    conv1d stack at bs=16 (net_configs.py 'deep')."""
    width = 2
    out_ch = (4 * [16 * width] + 4 * [32 * width] + 4 * [64 * width]
              + 4 * [128 * width] + [256 * width, 512])
    kernels = 9 * [3, 1]
    pools = 4 * [1, 1, 1, 2] + [1, 1]     # freq pool AFTER the layer
    layers = []
    cin, f = 1, MELS
    for i, (cout, k) in enumerate(zip(out_ch, kernels)):
        layers.append((f'conv2d L{i}', cin, cout, k, k, f))
        cin = cout
        f //= pools[i]
    # conv1d: input 512*8 = 4096 flattened, 8 layers at 512 channels
    c1_in = cin * f
    k1 = [1, 3, 1, 3, 1, 3, 1, 1]
    for i, k in enumerate(k1):
        layers.append((f'conv1d L{i}', c1_in, 512, k, 1, 1))
        c1_in = 512
    return layers


def main():
    rows = []
    tot_gf = tot_ms = 0.
    for name, cin, cout, kt, kf, f in deep_layers():
        gf = ms = 0.
        for mode in ('fwd', 'dx', 'dw'):
            g, m = conv_ms(B, T, f, cin, cout, kt, kf, mode)
            gf += g
            ms += m
        rows.append((name, cin, cout, f'{kt}x{kf}', f, gf, ms))
        tot_gf += gf
        tot_ms += ms
    # group the 18 conv2d layers by channel stage for the table
    print(f'| stage | Cin->Cout | freq | train GFLOP '
          f'| fill-modeled ms |')
    print('|---|---|---|---|---|')
    groups = {}
    for name, cin, cout, k, f, gf, ms in rows:
        stage = ('conv2d C<=64' if name.startswith('conv2d')
                 and cout <= 64 else
                 'conv2d C=128' if name.startswith('conv2d')
                 and cout == 128 else
                 'conv2d C>=256' if name.startswith('conv2d') else
                 'conv1d (4096->512 x8)')
        g = groups.setdefault(stage, [0., 0., set(), set()])
        g[0] += gf
        g[1] += ms
        g[2].add(cin)
        g[3].add(cout)
    for stage, (gf, ms, cins, couts) in groups.items():
        print(f'| {stage} | {min(cins)}->{max(couts)} | | '
              f'{gf:.0f} | {ms:.1f} |')
    # GRU: H=512, 2 paired-direction (D=2) layer-passes, MEASURED
    # split-kernel spans on v5e: fwd+grad 3.678 ms per layer-pass at
    # H=512 (PERFORMANCE.md round-4 move 1); latency-, not FLOP-bound.
    gru_gf = 4 * 2 * 3 * B * T * (512 * 512 * 3 + 512 * 512 * 3) / 1e9
    gru_ms = 2 * 3.678
    print(f'| GRU H=512 (2 paired-direction layer-passes, measured '
          f'3.68 ms each) | | | {gru_gf:.0f} | ~{gru_ms:.1f} |')
    # HBM terms: BN/pool/aug/loss traffic. Deep tower activations:
    # sum over layers of B*T*F*C * 2 bytes * ~6 passes (BN stats fwd,
    # normalize, act, grad x2, pool).
    act_bytes = 0
    for name, cin, cout, k, f, gf, ms in rows:
        act_bytes += B * T * max(f, 1) * cout * 2
    hbm_ms = act_bytes * 6 / (HBM_GBPS * 1e9) * 1e3
    print(f'| BN/aug/loss HBM terms (~{act_bytes * 6 / 1e9:.1f} GB) '
          f'| | | — | ~{hbm_ms:.0f} |')
    total_ms = tot_ms + gru_ms + hbm_ms
    print(f'| **architecture roofline** | | | '
          f'**{(tot_gf + gru_gf):.0f}** | **~{total_ms:.0f}** |')
    print()
    print(f'conv-only: {tot_gf:.1f} GFLOP, {tot_ms:.2f} ms fill-bound')
    print(f'analytic total {tot_gf + gru_gf:.0f} GFLOP vs XLA cost '
          f'model 2404.9 (deep_flops.py)')
    print(f'MFU at the bound: '
          f'{2404.9 / total_ms / PEAK_TFLOPS:.1%}')


if __name__ == '__main__':
    main()
