"""Assemble SCALING_r05.json (VERDICT r4 #6).

Round 4's N=2 projection inferred "pipelined streams overlap the host
work" from the sync-mode host share; this round measures streams mode
directly: scripts/host_residual.py run WITHOUT SIFT3D_SYNC_PHASES at
batch 12 (3 streams) and batch 16 (4 streams, the bench configuration),
plus a same-relay-phase sync-vs-streams pair at batch 12 so the overlap
claim is a paired measurement, not an inference across relay phases.

Inputs (written by scripts/host_residual.py):
  host_residual_sync_b12_r5.json      forced-sync, final round-5 tree
  host_residual_streams_b12.json      streams=3, earlier relay phase
  host_residual_sync_b12_p2.json      paired phase-2 sync leg
  host_residual_streams_b12_p2.json   paired phase-2 streams leg
  host_residual_streams_b16.json      streams=4 (bench config)
  wall_pair_b12.json                  UNINSTRUMENTED ABAB walls,
                                      streams=1 vs streams=3 (the
                                      overlap measurement itself — the
                                      StageTimer's per-stage sync points
                                      serialize the stream pipeline, so
                                      instrumented streams walls
                                      overstate; see caveat below)

Output: SCALING_r05.json
"""

from __future__ import annotations

import json
import os


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main() -> int:
    sync12 = load("host_residual_sync_b12_r5.json")
    str12 = load("host_residual_streams_b12.json")
    sync12b = load("host_residual_sync_b12_p2.json")
    str12b = load("host_residual_streams_b12_p2.json")
    str16 = load("host_residual_streams_b16.json")
    assert sync12 and str12 and str16, "run the host_residual ladder first"

    dev = sync12["device_ms_per_volume"]  # honest device time needs forced sync
    host_sync = sync12["host_ms_per_volume"]
    host_streams = max(
        s["host_ms_per_volume"] for s in (str12, str16) if s
    )  # conservative: the larger streams-mode host residual

    floor_sync = dev / (dev + host_sync)
    floor_streams = dev / (dev + host_streams)

    paired = None
    if sync12b and str12b:
        paired = {
            "note": (
                "same relay phase, back-to-back, WITH StageTimer: the "
                "instrumented streams wall (156 ms/vol) exceeds the "
                "instrumented sync wall (89 ms/vol) because the timer's "
                "per-stage sync points run once per STREAM and serialize "
                "the pipeline — use these cells only for host-stage "
                "attribution; the overlap question is answered by the "
                "uninstrumented ABAB pair below."
            ),
            "sync_wall_ms_per_volume": sync12b["wall_ms_per_volume"],
            "streams_wall_ms_per_volume": str12b["wall_ms_per_volume"],
            "sync_host_ms_per_volume": sync12b["host_ms_per_volume"],
            "streams_host_ms_per_volume": str12b["host_ms_per_volume"],
        }

    walls = load("wall_pair_b12.json")
    overlap = None
    if walls:
        un = (walls["sync1"] + walls["sync2"]) / 2
        st = (walls["streams1"] + walls["streams2"]) / 2
        overlap = {
            "note": (
                "UNINSTRUMENTED ABAB best-of-3 walls, batch 12, same relay "
                "phase: streams=1 (no pipelining) vs streams=3 (production "
                "pipelining). The gap is the host+sync work the pipeline "
                "hides behind device compute — the direct measurement of "
                "the 'streams overlap the host work' claim."
            ),
            "unpipelined_ms_per_volume": [walls["sync1"], walls["sync2"]],
            "streams_ms_per_volume": [walls["streams1"], walls["streams2"]],
            "overlap_hidden_ms_per_volume": round(un - st, 2),
            "streams_speedup": round(un / st, 3),
        }

    out = {
        "note": (
            "Round-5 streams-mode host-residual measurement (VERDICT r4 #6). "
            "All cells ON THE REAL CHIP (axon v5e behind the relay tunnel; "
            "wall numbers include relay congestion and swing with it — "
            "compare only within a paired cell). sim-mesh topology numbers "
            "are unchanged from SCALING_r04.json (same dist/ code paths; "
            "the 4-core-host caveat recorded there still applies)."
        ),
        "sync_b12": sync12,
        "streams_b12": str12,
        "streams_b16": str16,
        "paired_sync_vs_streams_b12_instrumented": paired,
        "overlap_measurement": overlap,
        "sync_b16_note": (
            "forced-sync batch 16 single-shot OOMs the 16 GB HBM "
            "(RESOURCE_EXHAUSTED): sync mode holds all 16 volumes' pyramid "
            "phases live at once, which is exactly why the bench runs batch "
            "16 as 4 software-pipelined streams of 4."
        ),
        "host_residual_finding": (
            f"Pure host work per volume is {host_sync:.2f} ms in sync mode "
            f"but {host_streams:.2f} ms in streams mode: the host stages "
            "(candidate/row layout, numpy decode, FeatureSet assembly) run "
            "once per STREAM, so splitting batch 12 into 3 sub-batches of 4 "
            "forfeits batch amortization, and the layout loops contend with "
            "the dispatch threads for the GIL. The streams-mode number is "
            "the one a pipelined production deployment actually pays."
        ),
        "n2_floor": {
            "device_ms_per_volume_sync": dev,
            "floor_with_sync_host": round(floor_sync, 3),
            "floor_with_streams_host": round(floor_streams, 3),
            "construction": (
                "N=2 placement-DP efficiency >= device/(device + host) even "
                "if ALL host work serializes on one host process "
                "(SCALING_r04 construction, device time re-measured on the "
                "final round-5 tree). The floor_with_streams_host value is "
                "the conservative bound using the streams-mode host residual "
                "(per-stream amortization loss included); the overlap "
                "measurement above shows the pipeline in practice hides "
                "most of the host+sync residual behind device compute, so "
                "the expected N=2 efficiency sits at or above the "
                "floor_with_sync_host value."
            ),
        },
    }
    with open("SCALING_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["n2_floor"], indent=1))
    print("wrote SCALING_r05.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
