"""Sampler invariant tests (PK structure, balanced batches, determinism)."""
import numpy as np
import pytest

from xmir_tpu.data import (
    HardMiningSampler,
    MultiLabelBalancedBatchSampler,
    PKSampler,
    create_groups,
)


class TestCreateGroups:
    def test_drops_small_groups(self):
        groups = [0, 0, 0, 1, 1, 2]
        binned = create_groups(groups, k=2)
        assert set(binned) == {0, 1}
        assert binned[0] == [0, 1, 2]

    def test_empty(self):
        assert create_groups([], 2) == {}


class TestPKSampler:
    def test_pk_structure(self):
        labels = [0] * 10 + [1] * 10 + [2] * 10
        p, k = 2, 3
        s = PKSampler(labels, p, k, seed=0)
        idxs = list(s)
        labels = np.array(labels)
        assert len(idxs) % (p * k) == 0
        for start in range(0, len(idxs), p * k):
            batch = idxs[start : start + p * k]
            batch_labels = labels[batch]
            uniq, counts = np.unique(batch_labels, return_counts=True)
            assert len(uniq) == p
            assert all(c == k for c in counts)

    def test_no_duplicate_within_epoch(self):
        labels = [0] * 8 + [1] * 8
        s = PKSampler(labels, 2, 4, seed=1)
        idxs = list(s)
        assert len(idxs) == len(set(idxs))

    def test_raises_with_too_few_groups(self):
        with pytest.raises(ValueError):
            PKSampler([0, 0, 1], p=3, k=1)

    def test_deterministic_given_seed(self):
        labels = [0] * 10 + [1] * 10 + [2] * 10
        a = list(PKSampler(labels, 2, 3, seed=42))
        b = list(PKSampler(labels, 2, 3, seed=42))
        assert a == b


class TestHardMining:
    def test_front_loads_hard(self):
        scores = [0.1, 0.9, 0.5, 0.8]
        s = HardMiningSampler(4, scores, num_hard=2, batch_size=4, seed=0)
        order = list(s)
        assert order[:2] == [1, 3]
        assert sorted(order) == [0, 1, 2, 3]


class TestMultiLabelBalanced:
    def test_batch_sizes_and_coverage(self, rng):
        labels = (rng.random((100, 14)) > 0.8).astype(np.float32)
        labels[labels.sum(1) == 0, 0] = 1.0
        s = MultiLabelBalancedBatchSampler(
            labels, batch_size=32, labels_per_batch=8, samples_per_label=4, seed=0
        )
        batches = list(s)
        assert len(batches) == 100 // 32
        for b in batches:
            assert len(b) == 32
            assert len(set(b)) == len(b)  # dedup within batch

    def test_deterministic(self, rng):
        labels = (rng.random((64, 5)) > 0.7).astype(np.float32)
        labels[labels.sum(1) == 0, 0] = 1.0
        a = list(
            MultiLabelBalancedBatchSampler(labels, batch_size=16, seed=7)
        )
        b = list(
            MultiLabelBalancedBatchSampler(labels, batch_size=16, seed=7)
        )
        assert a == b
