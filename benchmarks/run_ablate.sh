#!/bin/bash
# Sequential hardware ablation sweep (one process per variant; the chip
# must be otherwise idle). Results land on stdout, one JSON line each.
cd "$(dirname "$0")/.."
run() {
  echo "### $*" >&2
  env "$@" timeout 580 python benchmarks/ablate_mega.py 2>/dev/null
}
run A=baseline
run MCPT_MEGA_ABLATE=mat,mfn,nee_eval,bounce_eval
run MCPT_BENCH_SHADOW=0
run MCPT_BENCH_NDIR=0
run MCPT_MEGA_ABLATE=isect
run MCPT_MEGA_ABLATE=rng
run MCPT_MEGA_ABLATE=isect,rng,mat,mfn,nee_eval,bounce_eval MCPT_BENCH_NDIR=0
run MCPT_MEGA_UNROLL=1
run MCPT_MEGA_UNROLL=4
