#!/usr/bin/env bash
# Realistic-ring scaling rerun (VERDICT r4 item 7): the SAME factor-6400
# three-level e2e as bench_scaling.sh, but with every polygon ring
# densified to 513 points (SPARK_GRAFT_RING_DENSIFY=127 — the RingBench
# regime where the broadcast ring dictionary wins 24-31%) and
# SPARK_GRAFT_RING_DICT=broadcast. Output is APPENDED to
# BENCH/BASELINE.md as the ring-regime comparison rows.
# Run bench_scaling.sh (the plain-ring protocol run) first.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
FACTOR="${SPARK_GRAFT_E2E_FACTOR:-6400}"
RES="${SPARK_GRAFT_PIP_RES:-8}"
DENSIFY="${SPARK_GRAFT_RING_DENSIFY:-127}"
DICT="${SPARK_GRAFT_RING_DICT:-broadcast}"
LEVELS=(2 8 32)

sbt -batch package >&2
JAR=$(ls target/scala-2.13/osmliveupdatesspark_2.13-*.jar | head -1)

declare -A TPS SEC
for c in "${LEVELS[@]}"; do
  echo "== spark-submit local[$c] RING e2e (factor=$FACTOR densify=$DENSIFY dict=$DICT) ==" >&2
  line=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=$c \
    SPARK_GRAFT_E2E_FACTOR=$FACTOR SPARK_GRAFT_PIP_RES=$RES \
    SPARK_GRAFT_RING_DENSIFY=$DENSIFY SPARK_GRAFT_RING_DICT=$DICT \
    SPARK_GRAFT_E2E_REPS=2 SPARK_GRAFT_ONLY=none SPARK_GRAFT_SKIP_R2SHAPE=1 \
    /opt/spark/bin/spark-submit --master "local[$c]" \
      --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
      --conf "spark.driver.extraJavaOptions=-Xms${SPARK_DRIVER_MEM:-8g}" \
      --conf spark.ui.enabled=false \
      --class graft.Bench "$JAR" 2>&1 | grep '"metric"')
  TPS[$c]=$(sed 's/.*e2e_docs_per_sec"://; s/[^0-9.].*//' <<<"$line")
  SEC[$c]=$(sed 's/.*"e2e_pipeline"://; s/[^0-9.].*//' <<<"$line")
  echo "local[$c]: ${SEC[$c]} s, ${TPS[$c]} docs/sec" >&2
done

python3 - "$SF_DIR" "$FACTOR" "$DENSIFY" "$DICT" \
  "${SEC[2]}" "${TPS[2]}" "${SEC[8]}" "${TPS[8]}" "${SEC[32]}" "${TPS[32]}" <<'EOF'
import sys, datetime
sf, factor, dens, dct, s2, t2, s8, t8, s32, t32 = sys.argv[1:11]
t2f, t8f, t32f = float(t2), float(t8), float(t32)
e28 = t8f / (4 * t2f)
e832 = t32f / (4 * t8f)
doc = f"""

## Ring-regime rerun (r5): 513-point rings + broadcast ring dictionary

Same protocol, same input, but every ring densified x{dens} per edge
(5-point synthetic rectangles -> {5 + 4*int(dens)}-point rings — the regime a
real OSM polygon layer sits in; RingDensifySpec proves output parity)
and `SPARK_GRAFT_RING_DICT={dct}`. Absolute docs/sec is lower (each
candidate's refine walks ~100x more ring bytes); the question this
run answers is whether the 8->32 memory-bandwidth ceiling moves when
per-candidate shuffle bytes shrink to a dictionary id.

| cores | e2e wall (s) | docs/sec |
|---|---|---|
| local[2]  | {s2}  | {t2f:,.0f} |
| local[8]  | {s8}  | {t8f:,.0f} |
| local[32] | {s32} | {t32f:,.0f} |

| pair | efficiency (ring regime) | plain-ring run above |
|---|---|---|
| N=2 -> 4N=8   | **{e28:.2f}** | see protocol table |
| N=8 -> 4N=32  | **{e832:.2f}** | see protocol table |

Appended by scripts/bench_scaling_rings.sh on {datetime.date.today().isoformat()}.
"""
open("BENCH/BASELINE.md", "a").write(doc)
print(doc)
EOF
echo "appended ring-regime section to BENCH/BASELINE.md" >&2
