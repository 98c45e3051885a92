#!/usr/bin/env bash
# One-shot pre-round-end gate: everything the driver will check, from a
# CLEAN CHECKOUT of HEAD — round 3 shipped a working tree that compiled
# while HEAD did not, and the driver's bench/correctness came back
# empty. Run this before considering a round done.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ -n "$(git status --porcelain)" ]]; then
  echo "WARNING: working tree not clean — the driver runs HEAD, not your tree:" >&2
  git status --short >&2
fi

work=$(mktemp -d)
trap 'rm -rf "$work"' EXIT
git archive HEAD | tar -x -C "$work"
echo "== compiling HEAD in $work =="
# exit-code check, not a grep for "[success]": showSuccess := false
# (build.sbt, needed for the bench's bare-JSON stdout) suppresses the
# success banner this used to grep for
# log lives in $work: unique per run (concurrent gates can't clobber
# each other's tails) and removed by the trap
(cd "$work" && sbt -batch compile > "$work/compile.log" 2>&1) \
  || { echo "HEAD DOES NOT COMPILE"; tail -20 "$work/compile.log"; exit 1; }
echo "== HEAD compiles. Running tests + verify from the working repo =="

sbt -batch test 2>&1 | tail -3
rm -rf tmp/gate_verify
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 tmp/gate_verify" 2>&1 | tail -1
python3 scripts/check_oracle.py /root/testdata/sf0.01 tmp/gate_verify | tail -3
echo "== gate done =="
