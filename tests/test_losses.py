"""Loss tests against independent numpy oracles mirroring the reference
trainer math (ddp_trainer.py:186-238, :400-426)."""
import numpy as np
import jax.numpy as jnp

from pointcontrast_tpu.losses.contrastive import (
    point_info_nce_loss,
    hardest_contrastive_loss,
)
from pointcontrast_tpu.losses.semseg import (
    cross_entropy_ignore,
    fast_hist,
    per_class_iu,
    precision_at_one,
)


def np_softmax_ce(logits, labels):
    logits = logits - logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return -logp[np.arange(len(labels)), labels]


class TestPointInfoNCE:
    def test_matches_numpy_no_padding(self):
        rng = np.random.RandomState(0)
        n0, n1, p, c, T = 50, 60, 16, 8, 0.4
        f0 = rng.randn(n0, c).astype(np.float32)
        f0 /= np.linalg.norm(f0, axis=1, keepdims=True)
        f1 = rng.randn(n1, c).astype(np.float32)
        f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
        qi = rng.choice(n0, p, replace=False)
        ki = rng.choice(n1, p, replace=False)
        valid = np.ones(p, np.float32)

        got = float(point_info_nce_loss(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(qi), jnp.asarray(ki),
            jnp.asarray(valid), temperature=T))
        logits = f0[qi] @ f1[ki].T / T
        want = np_softmax_ce(logits, np.arange(p)).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_padding_invariance(self):
        """Adding padded (invalid) pairs must not change the loss."""
        rng = np.random.RandomState(1)
        n, p, c = 40, 12, 8
        f0 = rng.randn(n, c).astype(np.float32)
        f1 = rng.randn(n, c).astype(np.float32)
        qi = rng.choice(n, p, replace=False)
        ki = rng.choice(n, p, replace=False)
        base = float(point_info_nce_loss(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(qi), jnp.asarray(ki),
            jnp.asarray(np.ones(p, np.float32))))
        qi_pad = np.concatenate([qi, np.zeros(4, qi.dtype)])
        ki_pad = np.concatenate([ki, np.zeros(4, ki.dtype)])
        vmask = np.concatenate([np.ones(p), np.zeros(4)]).astype(np.float32)
        padded = float(point_info_nce_loss(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(qi_pad),
            jnp.asarray(ki_pad), jnp.asarray(vmask)))
        np.testing.assert_allclose(base, padded, rtol=1e-5)


class TestHardestContrastive:
    def _numpy_oracle(self, f0, f1, pos, cands0, cands1, all_pairs,
                      pos_thresh, neg_thresh):
        """Mirror of reference semantics: unmasked argmin then drop anchors
        whose hardest negative is a true positive pair."""
        pos_f0, pos_f1 = f0[pos[:, 0]], f1[pos[:, 1]]
        def pdist(a, b):
            d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            return np.sqrt(d2 + 1e-7)
        d01 = pdist(pos_f0, f1[cands1])
        d10 = pdist(pos_f1, f0[cands0])
        i01 = d01.argmin(1); m01 = d01.min(1)
        i10 = d10.argmin(1); m10 = d10.min(1)
        pair_set = {tuple(p) for p in all_pairs}
        mask0 = np.array([
            (pos[i, 0], cands1[i01[i]]) not in pair_set for i in range(len(pos))
        ])
        mask1 = np.array([
            (cands0[i10[i]], pos[i, 1]) not in pair_set for i in range(len(pos))
        ])
        pos_loss = np.maximum(
            ((pos_f0 - pos_f1) ** 2).sum(1) - pos_thresh, 0).mean()
        neg0 = (np.maximum(neg_thresh - m01[mask0], 0) ** 2).mean()
        neg1 = (np.maximum(neg_thresh - m10[mask1], 0) ** 2).mean()
        return pos_loss, 0.5 * (neg0 + neg1)

    def test_matches_numpy(self):
        rng = np.random.RandomState(2)
        n0, n1, c = 80, 90, 6
        f0 = rng.randn(n0, c).astype(np.float32)
        f1 = rng.randn(n1, c).astype(np.float32)
        # correspondences: random pairs incl. duplicates of anchors
        all_pairs = np.stack([
            rng.randint(0, n0, 60), rng.randint(0, n1, 60)], axis=1)
        pos = all_pairs[rng.choice(60, 20, replace=False)]
        cands0 = rng.choice(n0, 30, replace=False)
        cands1 = rng.choice(n1, 30, replace=False)
        pair_set = {tuple(p) for p in all_pairs}
        collide0 = np.array(
            [[(pos[i, 0], cands1[j]) in pair_set for j in range(30)]
             for i in range(20)])
        collide1 = np.array(
            [[(cands0[j], pos[i, 1]) in pair_set for j in range(30)]
             for i in range(20)])

        got_pos, got_neg = hardest_contrastive_loss(
            jnp.asarray(f0), jnp.asarray(f1),
            jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
            jnp.asarray(np.ones(20, np.float32)),
            jnp.asarray(cands0), jnp.asarray(np.ones(30, np.float32)),
            jnp.asarray(cands1), jnp.asarray(np.ones(30, np.float32)),
            jnp.asarray(np.packbits(collide0, axis=1, bitorder="little")),
            jnp.asarray(np.packbits(collide1, axis=1, bitorder="little")),
            pos_thresh=0.1, neg_thresh=1.4)
        want_pos, want_neg = self._numpy_oracle(
            f0, f1, pos, cands0, cands1, all_pairs, 0.1, 1.4)
        np.testing.assert_allclose(float(got_pos), want_pos, rtol=1e-4)
        np.testing.assert_allclose(float(got_neg), want_neg, rtol=1e-4)


class TestSemsegLoss:
    def test_ce_matches_numpy_with_ignore(self):
        rng = np.random.RandomState(3)
        n, k = 100, 7
        logits = rng.randn(n, k).astype(np.float32)
        labels = rng.randint(0, k, n)
        labels[::5] = 255
        got = float(cross_entropy_ignore(jnp.asarray(logits),
                                         jnp.asarray(labels)))
        keep = labels != 255
        want = np_softmax_ce(logits[keep], labels[keep]).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_hist_iou(self):
        pred = np.array([0, 1, 1, 2, 2, 2])
        label = np.array([0, 1, 2, 2, 2, 1])
        h = fast_hist(pred, label, 3)
        assert h.sum() == 6
        iu = per_class_iu(h)
        np.testing.assert_allclose(iu[0], 1.0)
        acc = float(precision_at_one(jnp.asarray(pred), jnp.asarray(label)))
        np.testing.assert_allclose(acc, 4 / 6 * 100, rtol=1e-5)
