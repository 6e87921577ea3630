"""Generate REFERENCE-STACK parity goldens by executing the reference
repository's own torch code (/root/reference) on synthetic fixtures.

Unlike make_parity_golden.py (a self-consistency pin computed by xmir_tpu's
own metric stack), every number emitted here is computed by the reference's
code itself — test.py's evaluate()/metric functions, train.py's in-training
eval, loss.py's loss classes, evaluation.py's CausalMetric — so the
committed fixtures prove quality parity against the reference, not merely
against ourselves.

The reference environment lacks torchvision/timm/open_clip here; those
imports feed only its model/transform constructors, never the metric or
loss math, so they are stubbed with empty modules before import. Everything
executed below is untouched reference code.

Outputs (committed under tests/fixtures/):
  reference_single_label_golden.npz   embeds/labels/dists + metrics JSON in
                                      cli/parity.py format, all values from
                                      reference test.py evaluate()
  reference_multilabel_golden.npz     embeds/labels + metrics JSON from
                                      reference compute_map_multilabel and
                                      the evaluate_multilabels P@K/R@K table
                                      (table values carry 2 printed decimals)
  reference_train_eval_golden.json    train.py:399-487 in-training eval
  reference_losses_golden.json        every loss.py / ath_model.py loss on
                                      fixed inputs
  reference_insdel_golden.json        evaluation.py CausalMetric ins/del AUC
                                      with a fixed linear embedder

Run:  python tests/fixtures/make_reference_goldens.py
(needs /root/reference checked out; the replay tests only read the fixtures)
"""
import contextlib
import io
import json
import os
import re
import sys
import tempfile
import types

import numpy as np
import torch

REFERENCE = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))


def _stub(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec probes (e.g. inside
    # transformers' availability checks) don't choke on the stub
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    """Stub the reference's model/transform-layer imports (unused by the
    metric and loss code we execute)."""
    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms", Compose=None, Resize=None)
    timm = _stub("timm", create_model=None)
    timm.data = _stub("timm.data", resolve_model_data_config=None)
    _stub(
        "model",
        **{
            n: None
            for n in (
                "ResNet50", "DenseNet121", "ConvNeXtV2", "ConvNeXtV2_SRA",
                "SwinV2", "DinoV2", "MedSigLIP", "conceptCLIP",
            )
        },
    )
    _stub(
        "read_data",
        **{
            n: None
            for n in (
                "ISICDataSet", "ChestXrayDataSet", "TBX11kDataSet",
                "VINDRDataSet", "VINDRConceptCLIPDataSet",
                "NIHChestXrayRetrievalDataSet",
            )
        },
    )


def _synthetic_single_label():
    """Same generator as make_parity_golden.py: the committed self-pinned
    golden and the reference-computed golden share one embedding set, so the
    replay test triangulates reference == xmir == committed pin."""
    rng = np.random.default_rng(12345)
    centers = rng.standard_normal((3, 32)).astype(np.float32) * 2.5
    labels = np.arange(60) % 3
    embeds = centers[labels] + rng.standard_normal((60, 32)).astype(np.float32) * 0.8
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    return embeds, labels.astype(np.int64)


def _synthetic_multilabel(n=48, c=14, seed=777):
    rng = np.random.default_rng(seed)
    labels = (rng.random((n, c)) < 0.18).astype(np.float32)
    labels[np.arange(n), rng.integers(0, c, n)] = 1.0  # >=1 positive each
    proto = rng.standard_normal((c, 32)).astype(np.float32)
    embeds = labels @ proto + rng.standard_normal((n, 32)).astype(np.float32) * 0.6
    return embeds.astype(np.float32), labels


class _Identity(torch.nn.Module):
    def forward(self, x):
        return x


def golden_single_label(ref_test):
    embeds, labels = _synthetic_single_label()
    loader = [(torch.from_numpy(embeds), torch.from_numpy(labels))]
    with tempfile.TemporaryDirectory() as td:
        args = types.SimpleNamespace(save_dir=td, resume="synthetic.ckpt")
        with contextlib.redirect_stdout(io.StringIO()):
            ref_test.evaluate(_Identity(), loader, torch.device("cpu"), args)
        art = np.load(os.path.join(td, "synthetic.npz"), allow_pickle=True)

    cls_field_order = (
        "precision_macro", "recall_macro", "f1_macro",
        "precision_weighted", "recall_weighted", "f1_weighted", "accuracy",
    )
    metrics = {
        **{f"R@{k}": float(v) for k, v in zip((1, 5, 10), art["acc"])},
        "mAP": float(art["mAP"]) * 100.0,
        **{f"mP@{k}": float(v) * 100.0 for k, v in zip((1, 5, 10), art["pr"])},
        "classification": {
            int(k): dict(zip(cls_field_order, map(float, art[f"classification_k{k}"])))
            for k in art["classification_k_values"]
        },
    }
    out = os.path.join(HERE, "reference_single_label_golden.npz")
    np.savez(
        out,
        embeds=embeds, labels=labels, dists=-np.asarray(art["dists"]),
        metrics=json.dumps(metrics, default=float),
    )
    print("single-label:", out, "mAP =", metrics["mAP"])


def golden_multilabel(ref_test):
    embeds, labels = _synthetic_multilabel()
    emb_t, lab_t = torch.from_numpy(embeds), torch.from_numpy(labels)

    emb_norm = torch.nn.functional.normalize(emb_t, p=2, dim=1)
    dists = torch.mm(emb_norm, emb_norm.t())
    dists.fill_diagonal_(-float("inf"))
    metrics = {
        f"mAP@jaccard>{t}": float(
            ref_test.compute_map_multilabel(dists, lab_t, threshold=t)
        ) * 100.0
        for t in (0.25, 0.5)
    }

    # The P@K/R@K table lives inline in evaluate_multilabels — run it and
    # parse its printed table (the only place the reference computes these).
    loader = [(emb_t, lab_t)]
    buf = io.StringIO()
    with tempfile.TemporaryDirectory() as td:
        args = types.SimpleNamespace(save_dir=td)
        with contextlib.redirect_stdout(buf):
            ref_test.evaluate_multilabels(
                _Identity(), loader, torch.device("cpu"), args
            )
    rows = re.findall(
        r"^(\d+)\s*\|\s*([\d.]+)\s*%?\s*\|\s*([\d.]+)\s*%?", buf.getvalue(), re.M
    )
    assert rows, f"could not parse P@K/R@K table from:\n{buf.getvalue()}"
    for k, p, r in rows:
        metrics[f"P@{k}"] = float(p)
        metrics[f"R@{k}"] = float(r)

    out = os.path.join(HERE, "reference_multilabel_golden.npz")
    np.savez(out, embeds=embeds, labels=labels,
             metrics=json.dumps(metrics, default=float))
    print("multilabel:", out, {k: round(v, 3) for k, v in metrics.items()})


def golden_train_eval(ref_train):
    embeds_s, labels_s = _synthetic_single_label()
    embeds_m, labels_m = _synthetic_multilabel()
    single = ref_train._compute_single_label_retrieval_metrics(
        torch.from_numpy(embeds_s), torch.from_numpy(labels_s)
    )
    multi = ref_train._compute_multilabel_retrieval_metrics(
        torch.from_numpy(embeds_m), torch.from_numpy(labels_m)
    )
    out = os.path.join(HERE, "reference_train_eval_golden.json")
    with open(out, "w") as f:
        json.dump(
            {"single": {k: float(v) for k, v in single.items()},
             "multilabel": {k: float(v) for k, v in multi.items()}},
            f, indent=2,
        )
    print("train-eval:", out)


def golden_losses(ref_loss, ref_ath):
    torch.manual_seed(0)
    embeds_s, labels_s = _synthetic_single_label()
    emb_s = torch.from_numpy(embeds_s[:24] * 3.0)  # unnormalized on purpose
    lab_s = torch.from_numpy(labels_s[:24])
    embeds_m, labels_m = _synthetic_multilabel(n=24)
    emb_m, lab_m = torch.from_numpy(embeds_m), torch.from_numpy(labels_m)
    rng = np.random.default_rng(99)
    logits = torch.from_numpy(rng.standard_normal((24, 14)).astype(np.float32))

    vals = {}
    for mining in ("batch_all", "batch_hard"):
        loss, aux = ref_loss.TripletMarginLoss(margin=1.0, mining=mining)(
            emb_s, lab_s
        )
        vals[f"triplet_{mining}"] = float(loss)
        vals[f"triplet_{mining}_aux"] = float(aux)
    vals["supcon_single"] = float(
        ref_loss.SupervisedContrastiveLoss()(emb_s, lab_s)
    )
    vals["supcon_multilabel"] = float(
        ref_loss.SupervisedContrastiveLoss()(emb_m, lab_m)
    )
    wml, _ = ref_loss.WeightedMultiLabelTripletLoss(margin=0.3)(emb_m, lab_m)
    vals["weighted_multilabel_triplet"] = float(wml)
    vals["jaccard_supcon"] = float(ref_loss.JaccardSupConLoss()(emb_m, lab_m))
    vals["asymmetric"] = float(ref_loss.AsymmetricLoss()(logits, lab_m))
    vals["multilabel_contrastive"] = float(
        ref_loss.MultiLabelContrastiveLoss()(emb_m, lab_m)
    )
    dual = ref_loss.DualBranchMultiLabelLoss()(
        {"embedding": emb_m, "logits": logits}, lab_m
    )
    vals["dual_branch"] = float(dual[0] if isinstance(dual, tuple) else dual)

    d = 16
    img_f = torch.from_numpy(rng.standard_normal((6, d)).astype(np.float32))
    txt_f = torch.from_numpy(rng.standard_normal((6, d)).astype(np.float32))
    tok_f = torch.from_numpy(rng.standard_normal((6, 49, d)).astype(np.float32))
    widths = [3, 0, 2, 5, 1, 4]  # includes an empty concept list
    concepts = [
        torch.from_numpy(rng.standard_normal((w, d)).astype(np.float32))
        if w else torch.zeros((0, d))
        for w in widths
    ]
    scale = torch.tensor(2.302585)  # ln(10)
    bias = torch.tensor(-0.5)
    vals["it_align"] = float(ref_loss.ITAlignLoss()(img_f, txt_f, scale, bias))
    vals["rc_align"] = float(
        ref_loss.RCAlignLoss()(tok_f, concepts, scale, bias)
    )
    total, it, rc = ref_loss.ConceptCLIPLoss(alpha=0.5)(
        img_f, txt_f, tok_f, concepts, scale, bias
    )
    vals["conceptclip_total"] = float(total)
    vals["conceptclip_it"] = float(it)
    vals["conceptclip_rc"] = float(rc)

    a, p_, n_ = (
        torch.from_numpy(rng.standard_normal((8, 48)).astype(np.float32))
        for _ in range(3)
    )
    vals["triplet_hash"] = float(ref_ath.TripletHashLoss()(a, p_, n_))

    inputs = {
        "widths": widths, "dim": d, "logit_scale": 2.302585, "logit_bias": -0.5,
    }
    out = os.path.join(HERE, "reference_losses_golden.json")
    with open(out, "w") as f:
        json.dump({"values": vals, "inputs": inputs}, f, indent=2)
    print("losses:", out, f"({len(vals)} values)")


def golden_insdel(ref_eval):
    """evaluation.py CausalMetric ins/del AUC with a fixed linear embedder
    on a 16x16 image (reference evaluation.py:46-138; substrate glue per
    evaluate_saliency.py: zeros for del, gkern blur for ins)."""
    size, step = 16, 37
    rng = np.random.default_rng(31337)
    w = rng.standard_normal((8, 3 * size * size)).astype(np.float32) * 0.1

    class LinearEmbed(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = torch.nn.Linear(3 * size * size, 8, bias=False)
            with torch.no_grad():
                self.fc.weight.copy_(torch.from_numpy(w))

        def forward(self, x):
            return self.fc(x.reshape(x.shape[0], -1))

    # reference calls .cuda(); run on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        model = LinearEmbed().eval()
        query = torch.from_numpy(
            rng.standard_normal((1, 3, size, size)).astype(np.float32)
        )
        # correlate the retrieved image with the query so cosine scores are
        # mostly positive and both the curve and the clip counter carry signal
        retrieved = 0.8 * query + 0.35 * torch.from_numpy(
            rng.standard_normal((1, 3, size, size)).astype(np.float32)
        )
        saliency = rng.random((1, size, size)).astype(np.float32)

        klen, nsig = 5, 2
        kern = ref_eval.gkern(klen, nsig)
        blur = lambda x: torch.nn.functional.conv2d(x, kern, padding=klen // 2)

        results = {}
        for mode, substrate in (("del", torch.zeros_like), ("ins", blur)):
            metric = ref_eval.CausalMetric(
                model, mode, step, substrate_fn=substrate, input_size=size
            )
            auc_val, zeros = metric.single_run(
                query.clone(), retrieved.clone(), torch.from_numpy(saliency)
            )
            results[mode] = {"auc": float(auc_val), "zero_clips": int(zeros)}
    finally:
        torch.Tensor.cuda = orig_cuda

    out = os.path.join(HERE, "reference_insdel_golden.json")
    with open(out, "w") as f:
        json.dump(
            {
                "results": results,
                "inputs": {"size": size, "step": step, "klen": klen,
                           "nsig": nsig, "seed": 31337},
            },
            f, indent=2,
        )
    print("ins/del:", out, results)


def main():
    sys.path.insert(0, REFERENCE)
    _install_stubs()
    import loss as ref_loss
    import ath_model as ref_ath
    import evaluation as ref_eval
    import test as ref_test
    import train as ref_train

    golden_single_label(ref_test)
    golden_multilabel(ref_test)
    golden_train_eval(ref_train)
    golden_losses(ref_loss, ref_ath)
    golden_insdel(ref_eval)


if __name__ == "__main__":
    main()
