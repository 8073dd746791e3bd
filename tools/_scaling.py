"""Shared two-parallelism scaling-bench harness (north_rule protocol).

The three official scaling jobs (image kernel in bench_scaling.py,
audio kernel in bench_scaling_audio.py, corpus pipeline in
bench_scaling_text.py) differ only in their GEN / RUNNER payloads and
report wording; the measurement protocol and the BENCH/BASELINE.md
section splice live here so a protocol fix applies to all three:

- fresh JVM per run (subprocess), identical input file set both levels;
- interleaved repetitions, best run per level — this box shows
  transient virtualization noise (per-core speed spread, steal
  spikes), so min-wall is the contention-free estimate;
- efficiency = throughput_4N / (4 * throughput_N), target 0.8;
- section replace-or-append keyed on the section title so re-running
  one job never clobbers the other sections.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_py(code: str, timeout: int = 2400) -> dict:
    """Run a python payload in a fresh interpreter; return its last
    JSON stdout line."""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(f"run failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def measure(small_code: str, large_code: str, reps: int,
            rate_key: str = "rows_per_sec") -> dict:
    """Interleave `reps` repetitions of both levels, return best runs
    per level + all repetitions + scaling efficiency."""
    runs_a, runs_b = [], []
    for _ in range(reps):
        runs_a.append(run_py(small_code))
        runs_b.append(run_py(large_code))
    a = max(runs_a, key=lambda r: r[rate_key])
    b = max(runs_b, key=lambda r: r[rate_key])
    eff = b[rate_key] / (4.0 * a[rate_key])
    return {
        "all_runs": {"small": runs_a, "large": runs_b},
        "runs": [a, b],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }


def format_section(title: str, intro: str, result: dict,
                   rate_label: str = "rows/sec",
                   rate_key: str = "rows_per_sec") -> str:
    a, b = result["runs"]
    return (
        f"## {title}\n\n{intro}\n\n"
        f"| cores | rows | wall_s | {rate_label} |\n|---|---|---|---|\n"
        + "".join(
            f"| local[{r['cores']}] | {r['rows']} | {r['wall_s']:.2f} "
            f"| {r[rate_key]:.2f} |\n" for r in result["runs"])
        + f"\n**Scaling efficiency = {b[rate_key]:.2f} / (4 x "
        f"{a[rate_key]:.2f}) = {result['scaling_efficiency']}** "
        f"({'meets' if result['meets_target'] else 'MISSES'} the 0.8 target)\n"
        + f"\nAll repetitions ({rate_label}): "
        + "small=" + str([round(r[rate_key], 1)
                          for r in result["all_runs"]["small"]])
        + ", large=" + str([round(r[rate_key], 1)
                            for r in result["all_runs"]["large"]])
        + "\n"
    )


def splice_section(title_prefix: str, section: str) -> None:
    """Replace the `## {title_prefix}...` section of BENCH/BASELINE.md
    in place (append if absent; create the file with a header if
    missing). Matching on a short stable prefix keeps the splice
    robust to wording drift in the rest of the heading."""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    if os.path.exists(md_path):
        with open(md_path) as f:
            md = f.read()
    else:
        md = "# BENCH/BASELINE — measured numbers\n"
    pat = re.compile(rf"## {re.escape(title_prefix)}.*?(?=\n## |\Z)", re.S)
    md = pat.sub(lambda _m: section, md) if pat.search(md) \
        else md + "\n" + section
    with open(md_path, "w") as f:
        f.write(md)
