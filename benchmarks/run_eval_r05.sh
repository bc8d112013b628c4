#!/bin/bash
# EVAL_r05 artifact (VERDICT r4 item 7): drive one eval protocol
# end-to-end ON CHIP — main_vqa.py --scheduled-eval at full 7B shape on
# the margin-profiled fake checkpoint + fake RSVQA-LR corpus. Records
# wall time, answers/s, and output-format integrity as EVAL_r05.json.
#
# Pre-flight: /root/fake7b_margin must exist
#   (python tools/make_fake_reference_ckpt.py --output /root/fake7b_margin \
#        --profile margin --resized-vocab 32000)
# and the axon relay must be up: curl -m 5 http://127.0.0.1:8083/init
set -u
cd "$(dirname "$0")/.."

DATA=/root/eval_rsvqa
[ -f "$DATA/LR_split_test_questions.json" ] || \
    python tools/make_fake_rsvqa.py --output "$DATA" --images 8 \
        --questions 48

OUTDIR=/tmp/eval_r05_out
rm -rf "$OUTDIR"
T0=$(date +%s.%N)
python main_vqa.py -c benchmarks/eval_r05.yaml \
    --model-path /root/fake7b_margin/FINAL.pt \
    --data-path "$DATA" --data-target LR \
    --batch-size 4 --scheduled-eval --output "$OUTDIR" \
    2>&1 | tee /tmp/eval_r05.log
T1=$(date +%s.%N)

python - "$T0" "$T1" <<'EOF'
import json, re, sys
t0, t1 = float(sys.argv[1]), float(sys.argv[2])
wall = t1 - t0
res = json.load(open("/tmp/eval_r05_out/vqa_result.json"))
log = open("/tmp/eval_r05.log").read()
acc = None
m = re.search(r"overall soft accuracy: ([0-9.]+)", log)
if m:
    acc = float(m.group(1))
# format integrity: every record carries the four protocol fields and a
# decodable string prediction
ok = all(isinstance(r.get("pred"), str)
         and isinstance(r.get("target"), str)
         and r.get("types") in ("presence", "comp", "rural_urban")
         and isinstance(r.get("question_id"), int) for r in res)
out = {"metric": "eval_vqa_scheduled_wall_s", "value": round(wall, 1),
       "unit": "s (main_vqa --scheduled-eval, 7B int8+W8A8 vision, "
               "fake RSVQA-LR, 24 questions, greedy <=50 tok)",
       "answers": len(res), "answers_per_s": round(len(res) / wall, 3),
       "format_ok": ok, "soft_accuracy_chance_level": acc}
json.dump(out, open("EVAL_r05.json", "w"), indent=1)
print(json.dumps(out))
EOF
