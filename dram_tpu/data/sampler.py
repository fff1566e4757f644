"""Class-balanced samplers over lobe-chunk datasets (pure NumPy).

Rebuild of the reference samplers (reference data_sampler.py): the
trainer-facing contract is an index iterable plus two statistics the
interval-regression loss consumes — `class_weights` and
`ctss_frequency_map` (count/total per label, 1e-5 for absent labels;
consumed at metrics.py:172-175).
"""

from __future__ import annotations

import numpy as np


def balanced_class_weights(labels):
    """sklearn 'balanced' heuristic: n_samples / (n_classes * count)."""
    labels = np.asarray(labels)
    classes, counts = np.unique(labels, return_counts=True)
    return classes, counts, len(labels) / (len(classes) * counts.astype(np.float64))


class LobeChunkCTSSSampler:
    """Per-epoch resampling uniform over the 6 CTSS labels, then uniform
    within label (reference LobeChunkCTSSSampler, data_sampler.py:66-110)."""

    def __init__(self, logger, data_source, batch_size,
                 balance_label_count=None, seed=None):
        self.data_source = data_source
        self.batch_size = batch_size
        self.logger = logger
        self.rng = np.random.default_rng(seed)

        self.ctsses = np.asarray([
            int(float(data_source.all_metas[uid]["ctss"]))
            for uid in data_source.uids])
        self.ctss_labels, self.ctss_counts, cws = \
            balanced_class_weights(self.ctsses)
        self.class_weights = list(cws)
        total = np.sum(self.ctss_counts)
        self.ctss_frequency_map = {int(cl): cnt / total for cl, cnt
                                   in zip(self.ctss_labels, self.ctss_counts)}
        for ctss_type in range(6):
            if ctss_type not in self.ctss_labels:
                self.class_weights.insert(ctss_type, max(self.class_weights))
                self.ctss_frequency_map[ctss_type] = 1e-5

        if balance_label_count is None:
            balance_label_count = int(np.median(self.ctss_counts))
        self.balance_label_count = balance_label_count
        self.total_n = self.balance_label_count * len(self.ctss_labels)
        self.grouped = {int(l): np.where(self.ctsses == l)[0]
                        for l in self.ctss_labels}
        if logger is not None:
            logger.info(f"CTSS distribution {self.ctss_labels}-{self.ctss_counts}; "
                        f"sampling {self.total_n} chunks/epoch")

    def frequency_array(self):
        """(6,) float32 for the jitted loss."""
        return np.asarray([self.ctss_frequency_map.get(i, 1e-5)
                           for i in range(6)], np.float32)

    def __iter__(self):
        out = []
        for _ in range(self.total_n):
            label = int(self.rng.choice(self.ctss_labels))
            out.append(int(self.rng.choice(self.grouped[label])))
        return iter(out)

    def __len__(self):
        return self.total_n


class LobeChunkCLESampler:
    """Balanced choice + stratified batch ordering (reference
    LobeChunkCLESampler, data_sampler.py:7-63; used by the COPDGene task)."""

    def __init__(self, logger, data_source, batch_size,
                 balance_label_count=None, seed=None):
        self.rng = np.random.default_rng(seed)
        ctsses = np.asarray([int(float(data_source.meta[uid]["cle"]))
                             for uid in data_source.uids])
        labels, counts, cws = balanced_class_weights(ctsses)
        cws = np.clip(cws / cws.sum(), 0.2, 0.8)
        self.class_weights = list(cws)
        total = counts.sum()
        self.ctss_frequency_map = {int(l): c / total
                                   for l, c in zip(labels, counts)}
        for t in range(6):
            if t not in labels:
                self.class_weights.insert(t, max(self.class_weights))
                self.ctss_frequency_map[t] = 1e-5
        if balance_label_count is None:
            balance_label_count = int(np.median(counts))

        sampling_indices, sampling_labels = [], []
        for l in labels:
            locs = np.where(ctsses == l)[0]
            pick = self.rng.choice(locs, balance_label_count)
            sampling_indices.extend(pick.tolist())
            sampling_labels.extend([l] * balance_label_count)

        # stratified shuffle into batch-sized groups
        from sklearn.model_selection import StratifiedShuffleSplit
        y = np.asarray(sampling_labels)
        X = np.zeros((len(y), 1))
        test_size = max(int(batch_size * 2), len(np.unique(y)))
        n_splits = max(1, len(y) // test_size)
        s = StratifiedShuffleSplit(n_splits=n_splits, test_size=test_size)
        strat = np.asarray([ti for _, ti in s.split(X, y)]).flatten().tolist()
        self.indices = [sampling_indices[i] for i in strat]

    def frequency_array(self):
        return np.asarray([self.ctss_frequency_map.get(i, 1e-5)
                           for i in range(6)], np.float32)

    def __iter__(self):
        return iter(self.indices)

    def __len__(self):
        return len(self.indices)
