#!/usr/bin/env python3
"""Compare two bench JSON lines (e.g. BENCH_r02.json's embedded line vs a
fresh run): per-query deltas sorted by regression size, with a noise
threshold so host-load jitter doesn't read as a regression.

Run: python tools/bench_compare.py OLD.json NEW.json [--noise 0.3]
Accepts either a raw bench line ({"metric": ...}) or a driver wrapper
({"tail": ..., "rc": ...}) whose last line embeds the bench JSON.
"""

from __future__ import annotations

import json
import sys


def load_bench(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    try:
        doc = json.loads(text)
    except ValueError:
        doc = None
    if doc is None or "queries" not in doc:
        # driver wrapper or raw bench stdout: the bench line is the last
        # parseable {"metric"...} line of the captured text/tail
        tail = (doc or {}).get("tail", text if doc is None else "")
        for line in reversed(tail.splitlines()):
            line = line.strip()
            i = line.find('{"metric"')
            if i >= 0:
                try:
                    return json.loads(line[i:])
                except ValueError:
                    continue
        # front-truncated single-line tail (the round-4 artifact): the
        # median block survived at the end — reconstruct from there
        j = tail.find('"queries_median"')
        if j >= 0:
            try:
                return json.loads("{" + tail[j:].strip())
            except ValueError:
                pass
        raise SystemExit(f"{path}: no bench line found")
    return doc


def _q(doc: dict) -> tuple[dict, str]:
    # bench prints medians as "queries" since round 5 (with min-of-N in a
    # separate bench_min line); older artifacts carried min as "queries"
    # and medians as "queries_median" — prefer the median stat either way.
    # Returns (queries, stat_label) so the caller can say WHICH stat each
    # side actually used: a pre-median artifact falls back to the min stat
    # and an unlabeled comparison would silently mix min vs median.
    if "queries_median" in doc:
        return doc["queries_median"], "median"
    stat = doc.get("stat", "")
    if stat.startswith("median"):
        return doc["queries"], "median"
    # Only pre-round-5 bench.py artifacts reach here (they carried min
    # per-query times and no "stat"/"queries_median" keys). Derive the
    # label from the metric NAME rather than mere key presence, so a
    # future artifact shape with a different stat can't be mislabeled
    # "min" and suppress/fabricate the STAT MISMATCH notice.
    metric = doc.get("metric", "")
    if metric.startswith("bench_"):
        return doc["queries"], "min (assumed pre-round-5 artifact)"
    return doc["queries"], "unknown"


def main(old_path: str, new_path: str, noise: float = 0.3) -> int:
    old, new = load_bench(old_path), load_bench(new_path)
    (oq, o_stat), (nq, n_stat) = _q(old), _q(new)
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "added" if a is None else "removed"))
            continue
        delta = (b - a) / a if a else 0.0
        flag = ""
        if delta > noise and b - a > 0.3:
            flag = "REGRESSED"
        elif delta < -noise and a - b > 0.3:
            flag = "improved"
        rows.append((-(delta), name, a, b, flag))
    rows.sort()
    shared = set(oq) & set(nq)
    to, tn = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    stat_note = (
        f"{o_stat} stat both sides"
        if o_stat == n_stat
        else f"STAT MISMATCH old={o_stat} new={n_stat} — deltas not comparable"
    )
    print(
        f"total over {len(shared)} shared ({stat_note}): {to:.2f} -> {tn:.2f} s "
        f"(noise gate ±{noise:.0%} and ±0.3 s)"
    )

    def _host_line(side: str, doc: dict) -> None:
        h = doc.get("host")
        if not h:
            print(f"  host[{side}]: (no host stamp — pre-r7 artifact)")
            return
        print(
            f"  host[{side}]: load {h.get('load_start', '?')} -> "
            f"{h.get('load_end', '?')} on {h.get('cpus', '?')} cpus, "
            f"median/min spread {h.get('spread', '?')}"
        )

    _host_line("old", old)
    _host_line("new", new)
    for _, name, a, b, flag in rows:
        if flag:
            a_s = f"{a:.2f}" if a is not None else "—"
            b_s = f"{b:.2f}" if b is not None else "—"
            print(f"  {name:36s} {a_s:>8} -> {b_s:>8}  {flag}")
    n_reg = sum(1 for r in rows if r[4] == "REGRESSED")
    print(f"{n_reg} regression(s) beyond noise")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noise = 0.3
    for a in sys.argv[1:]:
        if a.startswith("--noise"):
            noise = float(a.split("=", 1)[1]) if "=" in a else noise
    sys.exit(main(*args[:2], noise=noise))
