"""Render the per-query clean-minimum vs driver-bench delta table.

The driver's per-round BENCH_r{N}.json is a single timed pass through
bench.py inside whatever host window happened to be open; the clean
minima in BENCH/bench_clean_r*.json are per-query minima over many
probe-gated runs (tools/bench_hunt.py).  This table maps every driver
number to its clean floor so window degradation is auditable PER QUERY,
not per run: a driver figure near its floor is a real measurement; a
driver figure at 2-4x its floor with the same ratio across unrelated
queries is a degraded window (see BENCH/BASELINE.md "Rejected
single-shot runs").

Usage:
  python tools/bench_delta.py [BENCH_rNN.json] [bench_clean.json]
Defaults: newest BENCH_r*.json in the repo root, newest
BENCH/bench_clean_r*.json.  Prints a markdown table.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_driver(path: str) -> dict[str, float]:
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    # driver wrapper: the bench stdout JSON line is in "tail"
    m = re.search(r"\{.*\}", d.get("tail", ""), re.S)
    if m:
        try:
            return json.loads(m.group(0))["queries"]
        except Exception:
            pass
    # tail may hold only the truncated suffix of the JSON line — recover
    # the per-query pairs directly
    # scope the scrape to the "queries" object so stray numeric metadata
    # in the tail can never masquerade as a query row
    tail = d.get("tail", "")
    qm = re.search(r'"queries"\s*:\s*\{([^}]*)', tail, re.S)
    if not qm:
        return {}
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', qm.group(1))
    return {k: float(v) for k, v in pairs}


def main() -> None:
    driver_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else max(
            glob.glob(os.path.join(REPO, "BENCH_r*.json")),
            key=lambda f: int(re.search(r"_r(\d+)", f).group(1)),
        )
    )
    clean_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else max(
            glob.glob(os.path.join(REPO, "BENCH", "bench_clean_r*.json")),
            key=lambda f: int(re.search(r"_r(\d+)", f).group(1)),
        )
    )
    driver = load_driver(driver_path)
    clean = json.load(open(clean_path))["queries"]
    rows = []
    for q in sorted(set(driver) | set(clean)):
        dv, cv = driver.get(q), clean.get(q)
        ratio = (dv / cv) if (dv and cv) else None
        rows.append((q, cv, dv, ratio))
    print(f"| query | clean min s ({os.path.basename(clean_path)}) | "
          f"driver s ({os.path.basename(driver_path)}) | driver/clean |")
    print("|---|---|---|---|")
    for q, cv, dv, ratio in rows:
        print(
            f"| {q} | {cv if cv is not None else '—'} | "
            f"{dv if dv is not None else '—'} | "
            f"{f'{ratio:.2f}x' if ratio else '—'} |"
        )
    ratios = [r for *_, r in rows if r]
    if ratios:
        ratios.sort()
        med = ratios[len(ratios) // 2]
        print(f"\nmedian driver/clean: {med:.2f}x over {len(ratios)} queries; "
              f">2x (window-degraded): {sum(1 for r in ratios if r > 2)}")


if __name__ == "__main__":
    main()
