#!/usr/bin/env python
"""Summarize a training run's loss trajectory into CONVERGENCE.md.

Parses the train.log loss lines ([d_total, g_total, g_fm, g_mel, g_kl, step,
lr] -- the same scalar set the reference logs to TB, train.py:216-231) and
writes a markdown table sampled every ~N steps plus start/end deltas.

Usage: python scripts/report_convergence.py <model_dir> [out.md] [sample_every]
"""

import ast
import os
import re
import sys


def parse(log_path):
    rows, evals = [], []
    with open(log_path) as f:
        for line in f:
            e = re.search(r"eval step (\d+): mel_l1 ([\d.]+)", line)
            if e:
                evals.append((int(e.group(1)), float(e.group(2))))
                continue
            m = re.search(r"\tINFO\t(\[.*\])\s*$", line)
            if not m:
                continue
            try:
                vals = ast.literal_eval(m.group(1))
            except (ValueError, SyntaxError):
                continue
            if len(vals) == 7:
                rows.append(vals)
    return rows, evals


def main():
    model_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "CONVERGENCE.md"
    every = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    rows, evals = parse(os.path.join(model_dir, "train.log"))
    if not rows:
        sys.exit(f"no loss rows found in {model_dir}/train.log")

    picked, last_step = [], -every
    for r in rows:
        if r[5] >= last_step + every or r is rows[-1]:
            picked.append(r)
            last_step = r[5]
    if picked[-1] is not rows[-1]:
        picked.append(rows[-1])

    with open(out, "w") as f:
        f.write("| step | loss/d/total | loss/g/total | loss/g/fm | loss/g/mel "
                "| loss/g/kl | lr |\n|---|---|---|---|---|---|---|\n")
        for d, g, fm, mel, kl, step, lr in picked:
            f.write(f"| {step} | {d:.3f} | {g:.3f} | {fm:.3f} | {mel:.3f} "
                    f"| {kl:.3f} | {lr:.6f} |\n")
        if evals:
            f.write("\nCopy-synthesis quality trend (eval/mel_l1, full-utterance"
                    " infer through the sampling path at eval_interval):\n\n"
                    "| step | eval/mel_l1 |\n|---|---|\n")
            for step, v in evals:
                f.write(f"| {step} | {v:.4f} |\n")
    first, last = rows[0], rows[-1]
    print(f"wrote {out}: steps {first[5]}..{last[5]}, "
          f"mel {first[3]:.2f} -> {last[3]:.2f}, "
          f"d {first[0]:.2f} -> {last[0]:.2f}")


if __name__ == "__main__":
    main()
