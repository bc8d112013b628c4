#!/bin/bash
# One-command SERVING_r03 artifact: runs the serving bench at the 2304
# parity context twice (process 2 measures the cache-hit cold start,
# VERDICT r2 task #4) for the int8-KV contiguous scheduler AND the paged
# + prefix-cache + chunked-prefill scheduler. Writes SERVING_r03.json.
#
# Pre-flight: the axon relay must be up —
#   curl -m 5 http://127.0.0.1:8083/init
# (it died for 6+ h mid round 3; see CLAUDE.md environment facts).
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/SERVING_r03.json
: > "$OUT".tmp

run() { # name, extra args...
  name=$1; shift
  echo "== $name (cold process)" >&2
  cold=$(python benchmarks/serving_bench.py "$@" 2>/tmp/sb_"$name"_1.err | tail -1)
  echo "== $name (cache-hit process)" >&2
  warm=$(python benchmarks/serving_bench.py "$@" 2>/tmp/sb_"$name"_2.err | tail -1)
  python - "$name" "$cold" "$warm" >> "$OUT".tmp <<'EOF'
import json, sys
name, cold, warm = sys.argv[1], sys.argv[2], sys.argv[3]
rec = {"config": name}
try: rec["cold"] = json.loads(cold)
except Exception: rec["cold_error"] = cold[-300:]
try: rec["cache_hit"] = json.loads(warm)
except Exception: rec["warm_error"] = warm[-300:]
print(json.dumps(rec))
EOF
}

# slots=7 is the largest batch the axon remote-compile helper accepts at
# S_max=2304 (every (8, 2304) 7B program — contiguous or paged, any
# prompt width — fails with "tpu_compile_helper subprocess exit code 1";
# (7, 2304) compiles and runs; measured 2026-08-18). HBM itself fits 8
# int8-KV slots; the ceiling is the helper's compile-time resources.
run contiguous_int8 --slots 7 --cache-dtype int8 --new-tokens 96 \
    --speculative 4
run paged_prefix_int8 --slots 7 --cache-dtype int8 --new-tokens 96 \
    --paged --prefill-chunk 512

python - <<'EOF'
import json
recs = [json.loads(l) for l in open("benchmarks/SERVING_r03.json.tmp")]
best = None
for r in recs:
    v = (r.get("cache_hit") or r.get("cold") or {}).get("value")
    if v and (best is None or v > best):
        best = v
out = {"metric": "serving_aggregate_decode_tok_s_parity_ctx",
       "value": best, "unit": "tok/s (7B int8, S_max=2304)",
       "configs": recs}
json.dump(out, open("benchmarks/SERVING_r03.json", "w"), indent=1)
print(json.dumps({"metric": out["metric"], "value": best}))
EOF
rm -f "$OUT".tmp
