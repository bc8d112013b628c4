#!/bin/bash
# Re-run ONLY the prefix-heavy paged leg of SERVING_r04 (after the
# adaptive-chunk-width fix in serve/paged.py _prefill_chunked_host: a
# prefix-HIT wave's suffix prefill now runs at the suffix width instead
# of being padded to the full prefill_chunk) and patch the artifact's
# prefixheavy_paged record + speedup ratio in place.
#
# Pre-flight: curl -m 5 http://127.0.0.1:8083/init
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/SERVING_r04.json

echo "== prefixheavy_paged (rerun)" >&2
res=$(python benchmarks/serving_bench.py --slots 7 --cache-dtype int8 \
    --paged --prefill-chunk 512 --workload prefix-heavy \
    --prefix-len 1024 --suffix-len 64 --new-tokens 32 --requests 28 \
    2>/tmp/sb4_prefixheavy_paged_rerun.err | tail -1)

python - "$res" <<'EOF'
import json, sys
res = sys.argv[1]
out = json.load(open("benchmarks/SERVING_r04.json"))
rec = {"config": "prefixheavy_paged"}
try:
    rec["result"] = json.loads(res)
except Exception:
    rec["error"] = res[-300:]
    print("paged rerun FAILED:", res[-300:])
    raise SystemExit(1)
out["configs"] = [r for r in out["configs"]
                  if r["config"] != "prefixheavy_paged"] + [rec]
by = {r["config"]: r for r in out["configs"]}
def val(name):
    r = by.get(name, {})
    d = r.get("cache_hit") or r.get("cold") or r.get("result") or {}
    return d.get("value")
pc, pp = val("prefixheavy_contiguous"), val("prefixheavy_paged")
if pc and pp:
    out["ratios"]["prefixheavy_paged_speedup"] = round(pc / pp, 2)
json.dump(out, open("benchmarks/SERVING_r04.json", "w"), indent=1)
print(json.dumps({"prefixheavy_contiguous_wall_s": pc,
                  "prefixheavy_paged_wall_s": pp,
                  "speedup": out["ratios"].get("prefixheavy_paged_speedup")}))
EOF
