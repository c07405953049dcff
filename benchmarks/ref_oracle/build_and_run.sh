#!/bin/bash
# Build and run the REFERENCE renderer as a live parity oracle.
#
# The image ships no Eigen, so the build uses the minimal Eigen-compatible
# shim in this directory (original code implementing only the vector/matrix
# API surface the reference uses — see Eigen/Dense). The reference tree is
# mounted read-only; an optional spp override is patched into a COPY of
# main.cpp (the DEMO spp is hardcoded to the Renderer default 2048).
#
#   bash benchmarks/ref_oracle/build_and_run.sh [spp] [outdir]
#
# Renders the DEMO Cornell scene (384x384) to <outdir>/run/output.png.
# Round-4 result (spp 512, ~28 min on 8 CPU threads): the fresh render
# matches the checked-in golden /root/reference/cornellbox_demo.png to
# 0.37/255 quadrant-max — see tests/test_golden.py for how this anchored
# the golden-gap investigation.
set -euo pipefail
SPP="${1:-512}"
OUT="${2:-/tmp/ref_oracle}"
REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$OUT/run"
ln -sfn "$REF/models" "$OUT/models"
SRC="$OUT/main_patched.cpp"
python3 - "$REF/src/main.cpp" "$SRC" "$SPP" <<'PY'
import sys
src = open(sys.argv[1]).read()
old = "    r.Render(scene);"
assert src.count(old) >= 1
src = src.replace(old, f"    r.setSpp({int(sys.argv[3])});\n    r.Render(scene);", 1)
open(sys.argv[2], "w").write(src)
PY
g++ -std=c++17 -O3 -fopenmp -DDEMO -I "$HERE" -I "$REF/src" \
  "$SRC" "$REF/src/Renderer.cpp" "$REF/src/Scene.cpp" \
  "$REF/src/BVH.cpp" "$REF/src/lodepng.cpp" -o "$OUT/raytracing_demo"
cd "$OUT/run" && "$OUT/raytracing_demo"
echo "wrote $OUT/run/output.png"
