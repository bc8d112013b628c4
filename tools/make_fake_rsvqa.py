"""Generate a fake RSVQA-LR corpus for on-chip eval-protocol drives.

Writes the reference file layout (rsvqa.py:64-205 semantics: the
{prefix}_split_{split}_{questions,answers,images}.json triplet plus flat
{id}.tif images) so `main_vqa.py --data-target LR` runs end-to-end with no
real data. Question types cycle presence/count/comp/area — count/area are
filtered by the dataset, mirroring the reference protocol, so the run also
checks the filter. Accuracy is chance with fake weights; the artifact this
feeds (EVAL_r05.json) measures wall time, answers/s, and output-format
integrity, not accuracy.

Usage: python tools/make_fake_rsvqa.py --output /root/eval_rsvqa \
           [--images 8] [--questions 48]
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--questions", type=int, default=48)
    ap.add_argument("--prefix", default="LR")
    ap.add_argument("--split", default="test")
    ap.add_argument("--image-size", type=int, default=256)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    os.makedirs(args.output, exist_ok=True)
    rng = np.random.default_rng(0)
    qtypes = ["presence", "count", "comp", "area"]
    prompts = ["is there a road", "are there more buildings than trees",
               "is a river present", "is the area mostly rural"]
    questions, answers = [], []
    for i in range(args.questions):
        questions.append({
            "id": i, "img_id": i % args.images, "active": True,
            "type": qtypes[i % len(qtypes)],
            "question": f"{prompts[i % len(prompts)]} in region {i}?",
            "answers_ids": [i],
        })
        answers.append({"id": i, "answer": "yes" if i % 2 else "no",
                        "active": True})
    images = [{"id": i, "active": True,
               "questions_ids": [j for j in range(args.questions)
                                 if j % args.images == i]}
              for i in range(args.images)]
    for kind, payload in (("questions", questions), ("answers", answers),
                          ("images", images)):
        path = os.path.join(
            args.output, f"{args.prefix}_split_{args.split}_{kind}.json")
        with open(path, "w") as fh:
            json.dump({kind: payload}, fh)
    for i in range(args.images):
        arr = rng.integers(0, 255, (args.image_size, args.image_size, 3),
                           dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(
            os.path.join(args.output, f"{i}.tif"))
    kept = sum(1 for q in questions
               if q["type"] not in ("count", "area"))
    print(f"wrote {args.output}: {args.images} images, "
          f"{args.questions} questions ({kept} after count/area filter)")


if __name__ == "__main__":
    main()
