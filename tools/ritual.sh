#!/usr/bin/env bash
# The round-close ritual (rounds 9-13), as ONE command. Runs, in order:
#   1. full sbt test
#   2. Verify dump + DuckDB oracle compare at sf0.001 / sf0.01 / sf0.1
#   3. ANSI sweep           (full Verify under spark.sql.ansi.enabled)
#   4. geometry sweep       (local[4]/4 vs default dump, EXCEPT-diffed)
#   5. bench                (3-rep min-of-N; tripwire self-reported)
#   6. posture regression   (graft.Posture vs tools/posture_recorded.json;
#                            builds /tmp/graft_sf{10,100} via ScaleGen if absent)
#   6b. recall regression   (graft.RecallPosture on the 10x twins corpus
#                            vs tools/recall_recorded.json floors)
#   7. SURVEY 2.13 check    (gen_key_index --check)
#   8. leak self-grep
# Steps run SERIALLY — never overlap two Spark JVMs on the shared
# warehouse (dropStaleTables in one races reads in the other), and never
# compile while a step runs. Usage: bash tools/ritual.sh [--skip-bench]
set -euo pipefail
cd "$(dirname "$0")/.."
SKIP_BENCH=${1:-}

echo "== [0/8] compile + classpath export"
sbt -batch compile > /tmp/ritual_compile.log 2>&1 || { tail -20 /tmp/ritual_compile.log; exit 1; }
sbt -batch "export Runtime/fullClasspath" 2>/dev/null | tail -1 > /tmp/graft_cp.txt

echo "== [1/8] full test suite (per-test durations recorded, VERDICT r13 item 7)"
sbt -batch "Test/testOnly * -- -oD" > /tmp/ritual_test.log 2>&1 || { tail -30 /tmp/ritual_test.log; exit 1; }
grep "Tests:" /tmp/ritual_test.log | tail -1
# keep the suite under ~7 min: surface where the time goes so a new slow
# recall gate is caught at review time, not discovered rounds later
python3 - <<'EOF'
import re
pat = re.compile(r"^\[info\] - (.*) \(((?:\d+ \w+,? ?)+)\)$")
def secs(s):
    t = 0.0
    for n, u in re.findall(r"(\d+) (\w+)", s):
        n = int(n)
        t += n*60 if u.startswith("minute") else n if u.startswith("second") else n/1000.0
    return t
rows = []
for line in open('/tmp/ritual_test.log'):
    m = pat.match(line.rstrip())
    if m: rows.append((secs(m.group(2)), m.group(1)))
rows.sort(reverse=True)
print(f"timed tests: {len(rows)}, sum of per-test time {sum(t for t,_ in rows):.1f}s")
print("slowest 15:")
for t, n in rows[:15]: print(f"  {t:7.1f}s  {n[:90]}")
EOF

echo "== [2/8] 3-SF verify + oracle"
for sf in 0.001 0.01 0.1; do
  rm -rf "/tmp/ritual_v_$sf"
  bash tools/run.sh graft.Verify "/root/testdata/sf$sf" "/tmp/ritual_v_$sf" 2>"/tmp/ritual_verr_$sf.log"
  if grep -q "failed" "/tmp/ritual_verr_$sf.log"; then
    echo "VERIFY FAILURES at sf$sf:"; grep "failed" "/tmp/ritual_verr_$sf.log"; exit 1
  fi
  python3 tools/oracle_check.py "/root/testdata/sf$sf" "/tmp/ritual_v_$sf" | tail -1
done

echo "== [3/8] ANSI sweep (sf0.01)"
rm -rf /tmp/ritual_v_ansi
JDK_JAVA_OPTIONS="-Dspark.sql.ansi.enabled=true" \
  bash tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/ritual_v_ansi 2>/tmp/ritual_verr_ansi.log
grep -q "failed" /tmp/ritual_verr_ansi.log && { echo "ANSI FAILURES"; exit 1; }
echo "ANSI outputs: $(ls /tmp/ritual_v_ansi | wc -l)"

echo "== [4/8] geometry sweep (sf0.01, local[4]/4 vs the step-2 dump)"
rm -rf /tmp/ritual_v_geo
SPARK_GRAFT_CPUS=4 bash tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/ritual_v_geo 2>/dev/null
python3 - <<'EOF'
import duckdb, os, sys
a, b = "/tmp/ritual_v_0.01", "/tmp/ritual_v_geo"
keys = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
bad = []
for k in keys:
    pa, pb = f"{a}/{k}/*.parquet", f"{b}/{k}/*.parquet"
    try:
        d1 = duckdb.sql(f"SELECT count(*) FROM (SELECT * FROM '{pa}' EXCEPT ALL SELECT * FROM '{pb}')").fetchone()[0]
        d2 = duckdb.sql(f"SELECT count(*) FROM (SELECT * FROM '{pb}' EXCEPT ALL SELECT * FROM '{pa}')").fetchone()[0]
        if d1 or d2: bad.append((k, d1, d2))
    except Exception as e:
        bad.append((k, "ERR", str(e)[:80]))
print(f"geometry: {len(keys)-len(bad)}/{len(keys)} row-identical")
if bad:
    for x in bad[:10]: print(" ", x)
    sys.exit(1)
EOF

if [[ "$SKIP_BENCH" != "--skip-bench" ]]; then
  echo "== [5/8] bench (3 reps, sf0.1) — keep the host quiet"
  bash tools/run.sh graft.Bench 2>/dev/null | tail -1
  python3 - <<'EOF'
import json, sys
d = json.load(open('/tmp/graft_bench.json'))
print(f"bench total {d['value']} run_totals {d['run_totals']}")
if d["failed"] or d["tripwire"]:
    print("TRIPWIRE:", d["failed"], d["tripwire"]); sys.exit(1)
EOF
else
  echo "== [5/8] bench SKIPPED (--skip-bench)"
fi

echo "== [6/8] posture regression (builds scaled corpora if absent)"
[[ -d /tmp/graft_sf10 ]] || bash tools/run.sh graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf10 10 twins 2>/dev/null | tail -1
[[ -d /tmp/graft_sf100 ]] || bash tools/run.sh graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf100 100 twins 2>/dev/null | tail -1
# ADVICE r13: a Posture crash must FAIL the gate, not leave last round's
# /tmp/graft_posture.json to be re-read — remove it first, keep the run's
# exit status (no grep in the pipeline masking it), then check drifts.
rm -f /tmp/graft_posture.json
# 24g driver: the 38-key registry's 100x rows (dedup_paragraph_near,
# agg_mad_ranked) OOM the 8g default — measured r15, matches the r13
# maiden-run heap note
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
  bash tools/run.sh graft.Posture /root/testdata/sf0.1 /tmp/graft_sf10 /tmp/graft_sf100 > /tmp/ritual_posture.log 2>&1 \
  || { echo "POSTURE CRASH:"; tail -20 /tmp/ritual_posture.log; exit 1; }
python3 - <<'EOF'
import json, sys
d = json.load(open('/tmp/graft_posture.json'))
print('posture rows:', len(d['posture']), 'drifts:', d['drifts'])
if d['drifts']:
    sys.exit(1)
EOF

echo "== [6b/8] recall regression (10x twins corpus, VERDICT r13 item 1)"
rm -f /tmp/graft_recall.json
bash tools/run.sh graft.RecallPosture /tmp/graft_sf10 /root/testdata/sf0.1 10 > /tmp/ritual_recall.log 2>&1 \
  || { echo "RECALL CRASH:"; tail -20 /tmp/ritual_recall.log; exit 1; }
python3 - <<'EOF'
import json, sys
d = json.load(open('/tmp/graft_recall.json'))
print('recall rows:', len(d['recall']), 'drifts:', d['drifts'])
if d['drifts']:
    sys.exit(1)
EOF

echo "== [7/8] SURVEY 2.13 check"
python3 tools/gen_key_index.py --check

echo "== [8/8] leak self-grep"
hits=$(grep -riE "anthropic|claude|capybara|tengu|s3://|go/cc" src/ build.sbt README.md tools/ 2>/dev/null | grep -vi "slack$\|slack " | grep -cv "tolerance\|generous" || true)
echo "leak grep hits (expect 0): $hits"

echo "== RITUAL COMPLETE =="
