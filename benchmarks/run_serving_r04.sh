#!/bin/bash
# One-command SERVING_r04 artifact (VERDICT r3 items 1, 4, 6):
#   * contiguous headline at the deployed-precision recipe (W4A8 weights +
#     int8 lm_head + int8 KV, 7 slots, k=8 ticks, speculative floor) —
#     target >= 400 tok/s aggregate at the 2304 parity context;
#   * paged+prefix at the SAME geometry as contiguous int8 (fused paged
#     kernel, ops/paged_fused.py) — target <= 1.5x contiguous;
#   * prefix-heavy workload (28 short sessions sharing a 1024-token system
#     prompt) on both schedulers — the regime paged+prefix is FOR: the
#     shared prefix prefills once and every later admission is suffix-only.
# Writes benchmarks/SERVING_r04.json.
#
# Pre-flight: the axon relay must be up —
#   curl -m 5 http://127.0.0.1:8083/init
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/SERVING_r04.json
: > "$OUT".tmp

run() { # name, extra args...
  name=$1; shift
  echo "== $name (cold process)" >&2
  cold=$(python benchmarks/serving_bench.py "$@" 2>/tmp/sb4_"$name"_1.err | tail -1)
  echo "== $name (cache-hit process)" >&2
  warm=$(python benchmarks/serving_bench.py "$@" 2>/tmp/sb4_"$name"_2.err | tail -1)
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

run_once() { # name, extra args... (single process; prefix-heavy runs its
             # own compile pass internally)
  name=$1; shift
  echo "== $name" >&2
  res=$(python benchmarks/serving_bench.py "$@" 2>/tmp/sb4_"$name".err | tail -1)
  python - "$name" "$res" >> "$OUT".tmp <<'EOF'
import json, sys
name, res = sys.argv[1], sys.argv[2]
rec = {"config": name}
try: rec["result"] = json.loads(res)
except Exception: rec["error"] = res[-300:]
print(json.dumps(rec))
EOF
}

# slots=7 is the largest batch the axon remote-compile helper accepts at
# S_max=2304 (measured r3; (8, 2304) 7B programs fail in tpu_compile_helper).
run contiguous_w4a8_lm8 --slots 7 --cache-dtype int8 --bits 4h \
    --lm-head-bits 8 --new-tokens 96 --speculative 4
run contiguous_int8 --slots 7 --cache-dtype int8 --new-tokens 96
run paged_prefix_int8 --slots 7 --cache-dtype int8 --new-tokens 96 \
    --paged --prefill-chunk 512

# prefix-heavy: the paged-wins regime (end-to-end wall incl. prefills)
run_once prefixheavy_contiguous --slots 7 --cache-dtype int8 \
    --workload prefix-heavy --prefix-len 1024 --suffix-len 64 \
    --new-tokens 32 --requests 28
run_once prefixheavy_paged --slots 7 --cache-dtype int8 --paged \
    --prefill-chunk 512 --workload prefix-heavy --prefix-len 1024 \
    --suffix-len 64 --new-tokens 32 --requests 28

python - <<'EOF'
import json
recs = [json.loads(l) for l in open("benchmarks/SERVING_r04.json.tmp")]
best = None
ratios = {}
by = {r["config"]: r for r in recs}
for r in recs:
    v = ((r.get("cache_hit") or r.get("cold") or r.get("result") or {})
         .get("value"))
    if r["config"].startswith("contiguous") and v and (
            best is None or v > best):
        best = v
def val(name, key=None):
    r = by.get(name, {})
    d = r.get("cache_hit") or r.get("cold") or r.get("result") or {}
    return d.get(key or "value")
c = val("contiguous_int8"); p = val("paged_prefix_int8")
if c and p:
    ratios["paged_vs_contiguous_same_geometry"] = round(c / p, 2)
pc = val("prefixheavy_contiguous"); pp = val("prefixheavy_paged")
if pc and pp:
    ratios["prefixheavy_paged_speedup"] = round(pc / pp, 2)
out = {"metric": "serving_aggregate_decode_tok_s_parity_ctx",
       "value": best, "unit": "tok/s (7B, S_max=2304, k=8 ticks)",
       "ratios": ratios, "configs": recs}
json.dump(out, open("benchmarks/SERVING_r04.json", "w"), indent=1)
print(json.dumps({"metric": out["metric"], "value": best,
                  "ratios": ratios}))
EOF
rm -f "$OUT".tmp
