#!/usr/bin/env python
"""Attribute train-step device time to model phases (VERDICT r2 item 4).

Joins two artifacts produced on the real chip:
  1. an xplane trace of N steps (scripts/profile_train_xplane.py) -- true
     per-instruction device-busy time, but only HLO instruction names;
  2. the optimized HLO text of the same step (scripts/dump_train_hlo.py) --
     each instruction's `metadata={op_name="jit(train_step)/..."}` source
     path, which carries the flax module scopes (enc_p/enc_q/flow/dec,
     discriminators_N) and jax's jvp/transpose(jvp) fwd/bwd markers.

The join is on the leading `%instruction_name` token. Fusions are attributed
to their representative op's scope (XLA picks one constituent), so the table
is a coarse attribution -- good to a few ms -- not an exact cost model;
unscoped arithmetic (Adam, global-norm, loss scalars) lands in `opt/losses`.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/train_phase_profile.py /tmp/train_xplane /tmp/train_hlo.txt 5

``--per-disc`` swaps the phase table for a per-discriminator, per-conv-layer
breakdown of the ensemble (discriminators_0..5 x convs_0..5/conv_post, fwd
and bwd separately) -- the resolution needed to see WHERE the D time goes
(sublane-starved early layers vs fat late GEMMs vs per-op overhead).
"""

import glob
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

PHASES = [
    # (label, substring the op_name must contain, require/forbid backward)
    ("G fwd: dec",        "jvp(SynthesizerTrn)/dec",    False),
    ("G bwd: dec",        "jvp(SynthesizerTrn)/dec",    True),
    ("G fwd: flow",       "jvp(SynthesizerTrn)/flow",   False),
    ("G bwd: flow",       "jvp(SynthesizerTrn)/flow",   True),
    ("G fwd: enc_q",      "jvp(SynthesizerTrn)/enc_q",  False),
    ("G bwd: enc_q",      "jvp(SynthesizerTrn)/enc_q",  True),
    ("G fwd: enc_p",      "jvp(SynthesizerTrn)/enc_p",  False),
    ("G bwd: enc_p",      "jvp(SynthesizerTrn)/enc_p",  True),
    ("G other",           "jvp(SynthesizerTrn)",        None),
    ("D fwd (2 applies)",  "jvp(MultiPeriodDiscriminator)", False),
    ("D bwd",             "jvp(MultiPeriodDiscriminator)", True),
    ("STFT in loss",      "fft",                        None),
]


def classify(op_name: str) -> str:
    is_bwd = "transpose(jvp" in op_name
    # normalize `transpose(jvp(X))/sub` -> `jvp(X)/sub` so the same needle
    # matches forward and backward ops (the extra `)` otherwise misses)
    norm = re.sub(r"transpose\(jvp\(([^)]*)\)\)", r"jvp(\1)", op_name)
    for label, needle, want_bwd in PHASES:
        if needle in norm and (want_bwd is None or want_bwd == is_bwd):
            return label
    return "opt/losses/other"


def classify_per_dec(op_name: str) -> str:
    """Per-stage decoder breakdown: conv_pre, ups_i, s<i>/resblocks (the MRF
    at stage i = resblocks_{3i..3i+2}), conv_post -- fwd and bwd separately.
    The resolution needed to target the training decoder's 43/48%-util block
    (VERDICT r3 next #3): tiny-T stage1 vs XLA-direct stage2 vs
    Toeplitz-inflated packed stages 3/4 vs the transposed-conv upsamples."""
    is_bwd = "transpose(jvp" in op_name
    norm = re.sub(r"transpose\(jvp\(([^)]*)\)\)", r"jvp(\1)", op_name)
    if "jvp(SynthesizerTrn)/dec" not in norm:
        return "(non-dec)"
    tag = "glue"
    m = re.search(r"resblocks_(\d+)", norm)
    if m:
        tag = f"s{int(m.group(1)) // 3}/mrf"
    else:
        m = re.search(r"(ups_\d+|conv_pre|conv_post|cond)", norm)
        if m:
            tag = m.group(1)
    return f"{tag} {'bwd' if is_bwd else 'fwd'}"


def classify_per_disc(op_name: str) -> str:
    is_bwd = "transpose(jvp" in op_name
    norm = re.sub(r"transpose\(jvp\(([^)]*)\)\)", r"jvp(\1)", op_name)
    if "jvp(MultiPeriodDiscriminator)" not in norm:
        return "(non-D)"
    m = re.search(r"discriminators_(\d+)", norm)
    disc = f"d{m.group(1)}" if m else "d?"
    m = re.search(r"(convs_\d+|conv_post)", norm)
    layer = m.group(1) if m else "glue"
    return f"{disc}/{layer} {'bwd' if is_bwd else 'fwd'}"


def main():
    per_disc = "--per-disc" in sys.argv
    per_dec = "--per-dec" in sys.argv
    args = [a for a in sys.argv[1:] if a not in ("--per-disc", "--per-dec")]
    trace_dir, hlo_path = args[0], args[1]
    steps = int(args[2]) if len(args) > 2 else 1
    classify_fn = (classify_per_disc if per_disc
                   else classify_per_dec if per_dec else classify)

    name_to_op = {}
    pat = re.compile(r"^\s*(?:ROOT )?%([\w.\-]+) = .*op_name=\"([^\"]+)\"")
    with open(hlo_path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                name_to_op[m.group(1)] = m.group(2)

    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        sys.exit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())

    totals, unmatched_ps, matched_ps = {}, 0, 0
    module_ps = 0
    for p in xs.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        for line in p.lines:
            if line.name == "XLA Modules":
                module_ps += sum(ev.duration_ps for ev in line.events)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = p.event_metadata[ev.metadata_id]
                instr = md.name.split(" = ")[0].lstrip("%").strip()
                op_name = name_to_op.get(instr)
                if op_name is None:
                    unmatched_ps += ev.duration_ps
                    continue
                matched_ps += ev.duration_ps
                label = classify_fn(op_name)
                totals[label] = totals.get(label, 0) + ev.duration_ps

    ms = lambda ps: ps / 1e12 * 1000 / steps
    print(f"device-busy (XLA Modules line): {ms(module_ps):.1f} ms/step")
    print(f"op-time matched to HLO metadata: {ms(matched_ps):.1f} ms/step "
          f"(+ {ms(unmatched_ps):.1f} unmatched)")
    print(f"{'phase':<26} {'ms/step':>8}  {'%':>5}")
    for label, ps in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"{label:<26} {ms(ps):8.2f}  {100 * ps / max(matched_ps, 1):5.1f}")


if __name__ == "__main__":
    main()
