"""End-to-end demo on synthetic data: train -> checkpoint -> eval -> ingest
-> query -> saliency -> insertion/deletion, all through the public CLIs.

Runs on CPU or a single TPU chip:
    python examples/demo_end_to_end.py --workdir /tmp/xmir_demo [--cpu]
Takes a few minutes (model compiles dominate).
"""
import argparse
import glob
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/xmir_demo")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--epochs", type=int, default=2,
                   help="CI-of-record chip runs use more epochs so the "
                        "metrics artifact shows a learning curve")
    p.add_argument("--use-mesh", action="store_true",
                   help="Run the saliency/ins-del stage through the "
                        "deployment shape: sharded gallery index + the mesh "
                        "XAI fan-out (1-device mesh on a single chip)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.workdir, exist_ok=True)
    # the train CLI appends to its metrics log; start each demo run clean so
    # a reused workdir can't concatenate two learning curves into the artifact
    metrics_log = f"{args.workdir}/metrics.jsonl"
    if os.path.exists(metrics_log):
        os.remove(metrics_log)
    from xmir_tpu.data import split_txt, write_synthetic_covidx

    # hard mode: classes share a mean color and differ only by a subtle
    # frequency pattern under noise, so the untrained model scores near
    # chance and the committed metrics artifact shows a real learning curve
    img_dir, manifest = write_synthetic_covidx(args.workdir, n=36, size=48,
                                               hard=True)
    split_txt(manifest, f"{args.workdir}/train.txt", f"{args.workdir}/val.txt", 0.25)

    common = [
        "--dataset", "covid", "--dataset-dir", img_dir,
        "--model", "densenet121", "--embedding-dim", "32",
    ]

    print("\n=== 1. train ===")
    from xmir_tpu.cli import train as train_cli

    train_cli.main(common + [
        "--train-image-list", f"{args.workdir}/train.txt",
        "--val-image-list", f"{args.workdir}/val.txt",
        "--val-dataset-dir", img_dir,
        "-p", "3", "-k", "4", "--epochs", str(args.epochs), "--eval-freq", "1",
        "--eval-initial",
        "--lr", "1e-3", "--loss-name", "triplet_hard",
        "--save-dir", f"{args.workdir}/ckpt",
        "--metrics-log", f"{args.workdir}/metrics.jsonl",
    ])
    ckpt = sorted(glob.glob(f"{args.workdir}/ckpt/*best*.msgpack"))[0]

    print("\n=== 2. eval (reference test.py flow) ===")
    from xmir_tpu.cli import test as test_cli

    test_cli.main(common + [
        "--test-image-list", f"{args.workdir}/val.txt",
        "--resume", ckpt, "--save-dir", args.workdir, "--eval-batch-size", "8",
    ])

    print("\n=== 3. ingest + query (Milvus replacement) ===")
    from xmir_tpu.cli import ingest as ingest_cli
    from xmir_tpu.cli import query as query_cli

    ingest_cli.main(common + [
        "--split", "train", "--train-image-list", f"{args.workdir}/train.txt",
        "--resume", ckpt, "--output", f"{args.workdir}/gallery.npz",
        "--batch-size", "8",
    ])
    query_cli.main(common + [
        "--split", "test", "--test-image-list", f"{args.workdir}/val.txt",
        "--resume", ckpt, "--index", f"{args.workdir}/gallery.npz",
        "--top-k", "3", "--output", f"{args.workdir}/hits.json",
        "--batch-size", "8",
    ])
    hits = json.load(open(f"{args.workdir}/hits.json"))
    correct = sum(
        1 for h in hits if h["results"][0]["label"] == h["query_label"]
    )
    print(f">> top-1 label accuracy over {len(hits)} queries: "
          f"{100 * correct / len(hits):.1f}%")

    print("\n=== 4. saliency + insertion/deletion ===")
    from xmir_tpu.cli import evaluate_saliency

    evaluate_saliency.main(common + [
        "--split", "test", "--test-image-list", f"{args.workdir}/val.txt",
        "--resume", ckpt, "--window-size", "48", "--stride", "24",
        "--top-k", "2", "--step", "6272", "--limit", "2",
        "--output", f"{args.workdir}/insdel.json",
    ] + (["--use-mesh"] if args.use_mesh else []))

    # machine-readable summary for the committed learning-dynamics artifact
    # (tests/test_demo_artifact.py replays it)
    import time

    import jax

    evals = [
        json.loads(line)
        for line in open(f"{args.workdir}/metrics.jsonl")
        if json.loads(line).get("kind") == "eval"
    ]
    insdel = json.load(open(f"{args.workdir}/insdel.json"))
    summary = {
        "platform": jax.devices()[0].platform,
        "time": time.time(),
        "epochs": args.epochs,
        "use_mesh": args.use_mesh,
        "eval_mAP_by_epoch": [e["mAP"] for e in evals],
        "top1_label_accuracy_pct": 100 * correct / len(hits),
        "n_queries": len(hits),
        "insdel": insdel,
    }
    with open(f"{args.workdir}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)

    print("\nDemo artifacts in", args.workdir)
    for f in sorted(os.listdir(args.workdir)):
        print("  ", f)


if __name__ == "__main__":
    main()
