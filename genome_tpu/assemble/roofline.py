"""Roofline calculator (SURVEY.md §5.1): compares measured k-mer counting
throughput against the HBM-bandwidth bound for the active algorithm.

The bound is recomputed from the measured pass structure, not hard-coded
(BASELINE.md: "the bench harness recomputes the bound from measured pass
count and HBM bandwidth").
"""

from __future__ import annotations

# chip HBM bandwidth table (B/s); device_kind substrings, v5e-class default
HBM_BY_KIND = {
    "v5e": 819e9, "v5 lite": 819e9, "v5litepod": 819e9,
    "v4": 1228e9, "v5p": 2765e9, "v6e": 1640e9, "v6 lite": 1640e9,
    "cpu": 50e9,
}
DEFAULT_HBM = 819e9

# bytes of HBM traffic per k-mer for each counting strategy (8B keys)
BYTES_PER_KMER = {
    # 6-pass 8-bit LSD radix: 6 x (8 read + 8 write) — the driver's target
    "radix6": 96.0,
    # bucket partition: hist read + partition r/w + in-VMEM segment sort r/w
    "bucket": 40.0,
    # XLA comparator sort: not memory-roofline-meaningful; report vs radix6
    "xla_sort": 96.0,
}


def hbm_bandwidth(device_kind: str) -> float:
    kind = (device_kind or "").lower()
    for key, bw in HBM_BY_KIND.items():
        if key in kind:
            return bw
    return DEFAULT_HBM


def counting_roofline(device_kind: str, strategy: str = "radix6") -> float:
    """Ceiling in k-mers/s/chip for the given counting strategy."""
    return hbm_bandwidth(device_kind) / BYTES_PER_KMER.get(strategy, 96.0)


def report(device_kind: str, n_kmers: int, wall_s: float,
           strategy: str = "radix6", target_fraction: float = 0.8) -> dict:
    ceiling = counting_roofline(device_kind, strategy)
    value = n_kmers / max(wall_s, 1e-12)
    return {
        "device_kind": device_kind,
        "strategy": strategy,
        "kmers_per_s": value,
        "hbm_bytes_per_s": hbm_bandwidth(device_kind),
        "ceiling_kmers_per_s": ceiling,
        "fraction_of_roofline": value / ceiling,
        "target_kmers_per_s": target_fraction * ceiling,
        "vs_target": value / (target_fraction * ceiling),
    }
