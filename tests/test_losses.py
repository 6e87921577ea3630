"""Loss parity tests: cross-check the jnp losses against independent torch
(CPU) implementations of the reference formulas, plus hand-computed cases."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from xmir_tpu.losses import (
    asymmetric_loss,
    batch_all_triplet_loss,
    batch_hard_triplet_loss,
    conceptclip_loss,
    dual_branch_multilabel_loss,
    it_align_loss,
    jaccard_supcon_loss,
    multilabel_contrastive_loss,
    rc_align_loss,
    supcon_loss,
    triplet_hash_loss,
    weighted_multilabel_triplet_loss,
    auto_select_loss,
)


def _emb(rng, b=16, d=8):
    return rng.standard_normal((b, d)).astype(np.float32)


def _labels(rng, b=16, c=3):
    return rng.integers(0, c, b)


def _mh_labels(rng, b=16, c=5):
    lab = (rng.random((b, c)) > 0.6).astype(np.float32)
    lab[lab.sum(1) == 0, 0] = 1.0
    return lab


# --- independent torch oracles (formulas from the reference's cited papers) ---


def torch_batch_hard(e, l, margin=1.0):
    e = torch.tensor(e)
    l = torch.tensor(l)
    d = torch.cdist(e, e)
    eq = l[None, :] == l[:, None]
    eye = torch.eye(len(l), dtype=torch.bool)
    pos = (eq & ~eye).float()
    hp = (pos * d).max(1, keepdim=True).values
    negm = (~eq).float()
    dn = d + d.max(1, keepdim=True).values * (1 - negm)
    hn = dn.min(1, keepdim=True).values
    return torch.clamp(hp - hn + margin, min=0).mean().item()


def torch_batch_all(e, l, margin=1.0):
    e = torch.tensor(e)
    l = torch.tensor(l)
    d = torch.cdist(e, e)
    tl = d.unsqueeze(2) - d.unsqueeze(1) + margin
    n = len(l)
    eye = torch.eye(n, dtype=torch.bool)
    ne = ~eye
    distinct = ne.unsqueeze(2) & ne.unsqueeze(1) & ne.unsqueeze(0)
    eq = l.unsqueeze(0) == l.unsqueeze(1)
    valid = (~eq.unsqueeze(1)) & eq.unsqueeze(2) & distinct
    tl = valid.float() * tl
    tl = torch.clamp(tl, min=0)
    npos = (tl > 1e-16).sum()
    loss = tl.sum() / (npos + 1e-16)
    frac = npos / (valid.sum().float() + 1e-16)
    return loss.item(), frac.item()


def torch_supcon(e, l, t=0.07, eps=1e-8):
    e = F.normalize(torch.tensor(e), dim=1)
    logits = e @ e.t() / t
    b = e.size(0)
    self_mask = torch.eye(b, dtype=torch.bool)
    if torch.tensor(l).dim() == 1:
        lt = torch.tensor(l)
        pos = lt.unsqueeze(0).eq(lt.unsqueeze(1))
    else:
        lt = torch.tensor(l).float()
        pos = (lt @ lt.t()) > 0
    pos = pos & ~self_mask
    logits = logits.masked_fill(self_mask, -1e9)
    logp = logits - torch.logsumexp(logits, dim=1, keepdim=True)
    ppa = pos.sum(1)
    valid = ppa > 0
    loss = -(pos.float() * logp).sum(1)
    loss = loss[valid] / (ppa[valid].float() + eps)
    return loss.mean().item()


def torch_jaccard_supcon(e, l, t=0.07, eps=1e-8):
    e = F.normalize(torch.tensor(e), dim=1)
    l = torch.tensor(l).float()
    sim = e @ e.t() / t
    inter = l @ l.t()
    s = l.sum(1, keepdim=True)
    jac = inter / (s + s.t() - inter + eps)
    b = e.size(0)
    m = torch.eye(b).bool()
    jac = jac.masked_fill(m, 0.0)
    ws = jac.sum(1, keepdim=True) + eps
    w = jac / ws
    logp = sim - torch.logsumexp(sim.masked_fill(m, -1e9), dim=1, keepdim=True)
    loss = -(w * logp).sum(1)
    valid = ws.squeeze() > eps
    return loss[valid].mean().item()


def torch_asl(logits, y, gp=1.0, gn=4.0, clip=0.05, eps=1e-8):
    logits = torch.tensor(logits)
    y = torch.tensor(y).float()
    pp = torch.sigmoid(logits)
    pn = (1 - pp + clip).clamp(max=1.0)
    loss = y * torch.log(pp.clamp_min(eps)) + (1 - y) * torch.log(pn.clamp_min(eps))
    pt = pp * y + pn * (1 - y)
    gamma = gp * y + gn * (1 - y)
    loss = loss * torch.pow(1 - pt, gamma)
    return (-loss.sum(1).mean()).item()


def torch_weighted_ml_triplet(e, l, margin=0.3):
    e = F.normalize(torch.tensor(e), p=2, dim=1)
    l = torch.tensor(l).float()
    d = torch.cdist(e, e)
    inter = l @ l.t()
    s = l.sum(1).view(-1, 1)
    jac = inter / (s + s.t() - inter + 1e-8)
    loss, count = 0.0, 0
    for i in range(e.size(0)):
        pm = jac[i] > 0
        pm[i] = False
        nm = jac[i] == 0
        if not pm.any() or not nm.any():
            continue
        wp = jac[i][pm]
        dp = d[i][pm]
        hdn = d[i][nm].min()
        cur = F.relu(dp - hdn + margin)
        loss += (cur * wp).mean()
        count += 1
    if count == 0:
        return 0.0
    return (loss / count).item()


def torch_ml_contrastive(e, l, t=0.07, eps=1e-8, use_j=True):
    e = F.normalize(torch.tensor(e), dim=1)
    l = torch.tensor(l).float()
    inter = l @ l.t()
    card = l.sum(1, keepdim=True)
    jac = inter / (card + card.t() - inter).clamp_min(eps)
    b = e.size(0)
    eye = torch.eye(b, dtype=torch.bool)
    pos = (inter > 0) & ~eye
    w = jac * pos.float() if use_j else pos.float()
    logits = (e @ e.t() / t).masked_fill(eye, -1e9)
    logp = logits - torch.logsumexp(logits, dim=1, keepdim=True)
    ws = w.sum(1)
    valid = ws > 0
    loss = -(w * logp).sum(1)[valid] / ws[valid].clamp_min(eps)
    return loss.mean().item()


def torch_it_align(img, txt, ls, lb=None):
    img = F.normalize(torch.tensor(img), dim=-1)
    txt = F.normalize(torch.tensor(txt), dim=-1)
    b = img.size(0)
    t = torch.clamp(torch.tensor(ls), 0.0, 4.6052).exp()
    logits = t * (img @ txt.t())
    if lb is not None:
        logits = logits + lb
    logits = torch.clamp(logits, -50, 50)
    z = 2 * torch.eye(b) - 1
    return (-F.logsigmoid(z * logits).mean()).item()


def torch_rc_align(tok, concepts_list, ls, lb=None):
    valid = [i for i, c in enumerate(concepts_list) if c is not None and len(c) > 0]
    t = torch.clamp(torch.tensor(ls), 0.0, 4.6052).exp()
    rows = []
    for m in valid:
        patches = F.normalize(torch.tensor(tok[m]), dim=-1)
        row = []
        for n in valid:
            c = F.normalize(torch.tensor(concepts_list[n]), dim=-1)
            a = patches @ c.t()
            row.append(a.max(dim=0).values.mean())
        rows.append(torch.stack(row))
    sim = torch.stack(rows)
    logits = torch.clamp(t * sim + (lb or 0.0), -50, 50)
    z = 2 * torch.eye(len(valid)) - 1
    return (-F.logsigmoid(z * logits).mean()).item()


class TestTriplet:
    def test_batch_hard_matches_torch(self, rng):
        e, l = _emb(rng), _labels(rng)
        loss, aux = batch_hard_triplet_loss(jnp.asarray(e), jnp.asarray(l))
        assert float(loss) == pytest.approx(torch_batch_hard(e, l), abs=2e-3)
        assert float(aux) == -1.0

    def test_batch_all_matches_torch(self, rng):
        e, l = _emb(rng), _labels(rng)
        loss, frac = batch_all_triplet_loss(jnp.asarray(e), jnp.asarray(l))
        ref_loss, ref_frac = torch_batch_all(e, l)
        assert float(loss) == pytest.approx(ref_loss, abs=2e-3)
        assert float(frac) == pytest.approx(ref_frac, abs=1e-5)

    def test_jit_and_grad(self, rng):
        e, l = _emb(rng), _labels(rng)
        f = jax.jit(lambda e: batch_hard_triplet_loss(e, jnp.asarray(l))[0])
        g = jax.grad(f)(jnp.asarray(e))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSupCon:
    def test_single_label(self, rng):
        e, l = _emb(rng), _labels(rng)
        assert float(supcon_loss(jnp.asarray(e), jnp.asarray(l))) == pytest.approx(
            torch_supcon(e, l), rel=1e-3
        )

    def test_multi_label(self, rng):
        e, l = _emb(rng), _mh_labels(rng)
        assert float(supcon_loss(jnp.asarray(e), jnp.asarray(l))) == pytest.approx(
            torch_supcon(e, l), rel=1e-3
        )

    def test_jaccard_supcon(self, rng):
        e, l = _emb(rng), _mh_labels(rng)
        assert float(
            jaccard_supcon_loss(jnp.asarray(e), jnp.asarray(l))
        ) == pytest.approx(torch_jaccard_supcon(e, l), rel=1e-3)


class TestMultiLabel:
    def test_asl(self, rng):
        logits = _emb(rng, 16, 5)
        y = _mh_labels(rng)
        assert float(
            asymmetric_loss(jnp.asarray(logits), jnp.asarray(y))
        ) == pytest.approx(torch_asl(logits, y), abs=1e-5)

    def test_weighted_ml_triplet_vectorization(self, rng):
        e, l = _emb(rng), _mh_labels(rng)
        loss, _ = weighted_multilabel_triplet_loss(jnp.asarray(e), jnp.asarray(l))
        assert float(loss) == pytest.approx(torch_weighted_ml_triplet(e, l), abs=2e-3)

    def test_ml_contrastive(self, rng):
        e, l = _emb(rng), _mh_labels(rng)
        assert float(
            multilabel_contrastive_loss(jnp.asarray(e), jnp.asarray(l))
        ) == pytest.approx(torch_ml_contrastive(e, l), rel=1e-3)

    def test_dual_branch(self, rng):
        e, l = _emb(rng), _mh_labels(rng)
        logits = _emb(rng, 16, 5)
        total, aux = dual_branch_multilabel_loss(
            {"embedding": jnp.asarray(e), "logits": jnp.asarray(logits)},
            jnp.asarray(l),
            alpha=0.5,
        )
        expected = torch_ml_contrastive(e, l) + 0.5 * torch_asl(logits, l)
        assert float(total) == pytest.approx(expected, rel=1e-3)
        assert set(aux) == {"contrastive", "asl"}


class TestAlign:
    def test_it_align(self, rng):
        img, txt = _emb(rng, 8, 16), _emb(rng, 8, 16)
        for ls, lb in [(3.0, None), (10.0, -2.0)]:
            got = float(it_align_loss(jnp.asarray(img), jnp.asarray(txt), ls, lb))
            assert got == pytest.approx(torch_it_align(img, txt, ls, lb), rel=1e-3)

    def test_rc_align_padded_matches_looped(self, rng):
        b, n, d, wmax = 6, 10, 16, 4
        tok = rng.standard_normal((b, n, d)).astype(np.float32)
        counts = rng.integers(0, wmax + 1, b)
        counts[0] = 0  # one sample with no concepts
        if (counts > 0).sum() == 0:
            counts[1] = 2
        concepts_list = [
            rng.standard_normal((c, d)).astype(np.float32) if c > 0 else None
            for c in counts
        ]
        padded = np.zeros((b, wmax, d), dtype=np.float32)
        mask = np.zeros((b, wmax), dtype=bool)
        for i, c in enumerate(concepts_list):
            if c is not None:
                padded[i, : len(c)] = c
                mask[i, : len(c)] = True
        got = float(
            rc_align_loss(jnp.asarray(tok), jnp.asarray(padded), jnp.asarray(mask), 3.0)
        )
        assert got == pytest.approx(torch_rc_align(tok, concepts_list, 3.0), rel=1e-3)

    def test_conceptclip_combination(self, rng):
        b, n, d, wmax = 4, 6, 8, 3
        img, txt = _emb(rng, b, d), _emb(rng, b, d)
        tok = rng.standard_normal((b, n, d)).astype(np.float32)
        padded = rng.standard_normal((b, wmax, d)).astype(np.float32)
        mask = np.ones((b, wmax), dtype=bool)
        total, it, rc = conceptclip_loss(
            jnp.asarray(img), jnp.asarray(txt), jnp.asarray(tok),
            jnp.asarray(padded), jnp.asarray(mask), 3.0, alpha=0.5,
        )
        assert float(total) == pytest.approx(float(it) + 0.5 * float(rc), abs=1e-6)


class TestHash:
    def test_triplet_hash(self, rng):
        a, p, n = _emb(rng, 8, 32), _emb(rng, 8, 32), _emb(rng, 8, 32)
        got = float(triplet_hash_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)))
        mv = 0.5 * 32
        pl = ((a - p) ** 2).mean(1)
        nl = ((a - n) ** 2).mean(1)
        ref = np.maximum(mv - nl + pl, 0).mean()
        assert got == pytest.approx(ref, abs=1e-4)


class TestAutoSelect:
    def test_policy(self):
        assert auto_select_loss("vindr", "conceptclip") == "conceptclip"
        assert auto_select_loss("nih") == "jaccard_supcon"
        assert auto_select_loss("vindr") == "weighted_multilabel_triplet"
        assert auto_select_loss("covid") == "triplet"
