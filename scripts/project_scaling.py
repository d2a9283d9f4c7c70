#!/usr/bin/env python
"""Analytic multi-chip scaling projection for the sharded SpMV paths.

This environment has ONE physical TPU; the virtual-CPU-mesh runs prove the
collectives and code paths but their efficiencies are meaningless as perf
evidence (VERDICT round 2). This tool replaces them with per-shard BYTE
ACCOUNTING: for each sharded path (parallel/sharded.py) and headline proxy,
it computes per-spmv local compute time (measured single-chip time / N,
i.e. assuming perfect row/column splits — fair_splits makes shards within
1% on these matrices) and the collective's wire bytes, then projects
efficiency against the v5e ICI budget.

Link model (public v5e specs, "How to Scale Your Model" numbers): 4 ICI
links/chip, ~45 GB/s usable each direction per link. A ppermute shifts one
hop and can use one link pair: ~45 GB/s. A psum (all-reduce) of B bytes on
a 1D ring moves 2*B*(N-1)/N per chip at ring bandwidth (~45 GB/s per
direction): t = 2*B*(N-1)/(N*45e9). One-hop latency ~1 us is charged per
collective step.

Pure host arithmetic — no jax, no TPU. Emits the REPORT.md S4 table.

    python scripts/project_scaling.py
"""
import json
import os

GBs = 1e9
ICI_BW = 45 * GBs  # usable per direction per link (v5e, one hop)
HOP_US = 1.0  # per collective step latency

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (proxy, m, n, path, single-chip time from the committed record key)
# Halo reach: window wr (chunks of 128 rows x 128 lanes) / DIA pad_sub rows.


def load_details():
    with open(os.path.join(REPO, "BENCH_DETAILS.json")) as f:
        return {d["matrix"]: d for d in json.load(f)}


def fmt_us(t):
    return f"{t * 1e6:.1f}"


def project():
    det = load_details()
    rows = []
    # Each entry: (proxy, path, local_time(N), comm_bytes(N), comm_steps)
    # comm_bytes = wire bytes per chip per spmv.
    f4 = 4  # f32 bytes

    def add(proxy, path, comm_bytes_fn, steps_fn, note):
        d = det.get(proxy)
        if d is None:
            return
        t1 = d["time_s"]
        for n in (4, 8, 16):
            t_local = t1 / n
            b = comm_bytes_fn(n, d)
            t_comm = b / ICI_BW + steps_fn(n) * HOP_US * 1e-6
            # halo/ring paths overlap comm with compute where the code
            # overlaps (ring); conservatively serialize otherwise
            t_tot = max(t_local, t_comm) if "overlap" in note else (
                t_local + t_comm
            )
            eff = t1 / (n * t_tot)
            rows.append(
                (proxy, path, n, t_local, b, t_comm, eff, note)
            )

    # 1) row-sharded ELL / multidevice routed: no exchange (x replicated
    #    host-side per shard; y shards concatenate on the host boundary)
    for proxy in ("caida_like",):
        add(proxy, "multidevice routed (row blocks)",
            lambda n, d: 0, lambda n: 0, "no collective")
    # 2) column-sharded CSR + psum: all-reduce of the full m-row partial
    add("thermal2_like", "cols + psum",
        lambda n, d: 2 * d["m"] * f4 * (n - 1) / n,
        lambda n: 2 * (n - 1), "ring all-reduce")
    add("fem_3d_thermal2_like", "cols + psum",
        lambda n, d: 2 * d["m"] * f4 * (n - 1) / n,
        lambda n: 2 * (n - 1), "ring all-reduce")
    # 3) ring ELL: x rotates one shard per step, n-1 steps, overlapped
    add("caida_like", "ring ELL (x rotation)",
        lambda n, d: d["n"] * f4 * (n - 1) / n,
        lambda n: n - 1, "overlap with local stripes")
    # 4) DIA halo: one ppermute per direction of pad_sub*128 rows
    #    (raefsky pad_sub <= 8 sublane-rows: 8*128*4 B each way)
    add("raefsky1_like", "DIA halo",
        lambda n, d: 2 * 8 * 128 * f4, lambda n: 2, "1-hop halo")
    # 5) window halo: wr 128-row chunks each direction (thermal2 wr=16)
    add("thermal2_like", "window halo",
        lambda n, d: 2 * 16 * 128 * 128 * f4, lambda n: 2, "1-hop halo")
    add("fem_3d_thermal2_like", "window halo",
        lambda n, d: 2 * 8 * 128 * 128 * f4, lambda n: 2, "1-hop halo")
    return rows


def main():
    rows = project()
    print("| proxy | sharded path | N | t_local | wire B/chip | t_comm | proj. eff | notes |")
    print("|---|---|---|---|---|---|---|---|")
    for proxy, path, n, tl, b, tc, eff, note in rows:
        print(
            f"| {proxy} | {path} | {n} | {fmt_us(tl)} us | "
            f"{b / 1e3:.0f} KB | {fmt_us(tc)} us | {eff * 100:.0f}% | {note} |"
        )


if __name__ == "__main__":
    main()
