"""Group-aware sampler: reference DistributedGroupSampler semantics
(/root/reference/det3d/datasets/loader/sampler.py:139-223) — batch-chunk
group homogeneity, per-host slicing, epoch determinism across resume."""

import numpy as np
import pytest

from partner_tpu.data.loader import DataLoader, EpochSampler, GroupSampler


def _oracle_num_samples(flag, bs, hosts):
    """Independent restatement of the reference's per-group padding
    arithmetic (sampler.py:170-183)."""
    import math

    sizes = np.bincount(flag)
    return sum(int(math.ceil(s / bs / hosts)) * bs for s in sizes)


class TestGroupSampler:
    def _flags(self, rng, n=97, groups=3):
        return rng.randint(0, groups, size=n).astype(np.int64)

    def test_batches_are_group_homogeneous(self, rng):
        flag = self._flags(rng)
        for hosts in (1, 2, 4):
            for host in range(hosts):
                s = GroupSampler(flag, batch_size=4, num_hosts=hosts,
                                 host_id=host, seed=3)
                idx = s.indices(epoch=5)
                assert len(idx) == s.num_samples
                for b in idx.reshape(-1, 4):
                    assert len(np.unique(flag[b])) == 1, (
                        f"mixed-group batch {flag[b]}"
                    )

    def test_tiny_group_pads_by_cycling(self):
        # a group smaller than half its pad target: the reference's
        # single-slice pad (sampler.py:197-199) under-fills here and trips
        # its own total_size assert; cycling must keep every batch
        # homogeneous and lengths exact
        flag = np.array([0] * 3 + [1] * 29, np.int64)
        s = GroupSampler(flag, batch_size=8, num_hosts=2, host_id=0, seed=1)
        idx = s.indices(epoch=0)
        assert len(idx) == s.num_samples
        for b in idx.reshape(-1, 8):
            assert len(np.unique(flag[b])) == 1, f"mixed batch {flag[b]}"

    def test_num_samples_matches_reference_arithmetic(self, rng):
        flag = self._flags(rng, n=131, groups=4)
        for bs, hosts in [(1, 1), (2, 3), (4, 2), (8, 8)]:
            s = GroupSampler(flag, batch_size=bs, num_hosts=hosts)
            assert s.num_samples == _oracle_num_samples(flag, bs, hosts)
            assert s.total_size == s.num_samples * hosts

    def test_host_shards_are_disjoint_and_cover(self, rng):
        flag = self._flags(rng, n=64, groups=2)
        hosts = 4
        shards = [
            GroupSampler(flag, 4, num_hosts=hosts, host_id=h,
                         seed=1).indices(epoch=2)
            for h in range(hosts)
        ]
        allidx = np.concatenate(shards)
        s0 = GroupSampler(flag, 4, num_hosts=hosts, host_id=0, seed=1)
        assert len(allidx) == s0.total_size
        # padding repeats at most the group-head indices; every dataset
        # index must still appear at least once across hosts
        assert set(allidx.tolist()) == set(range(len(flag)))

    def test_epoch_determinism_across_resume(self, rng):
        """A re-constructed sampler (checkpoint resume) replays the same
        permutation for the same (seed, epoch) and a different one for the
        next epoch."""
        flag = self._flags(rng)
        a = GroupSampler(flag, 4, seed=7).indices(epoch=3)
        b = GroupSampler(flag, 4, seed=7).indices(epoch=3)  # "resumed"
        c = GroupSampler(flag, 4, seed=7).indices(epoch=4)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_single_group_degenerates_gracefully(self):
        flag = np.zeros(10, np.int64)
        s = GroupSampler(flag, batch_size=2, seed=0)
        idx = s.indices(0)
        assert sorted(idx.tolist()) == sorted(range(10))


class _FakeDataset:
    """Items carry their index + group so batches can be checked."""

    def __init__(self, flag):
        self.flag = np.asarray(flag)

    def __len__(self):
        return len(self.flag)

    def __getitem__(self, i):
        return {"idx": int(i), "group": int(self.flag[i])}


def _collate(items):
    return {"idx": [it["idx"] for it in items],
            "group": [it["group"] for it in items]}


class TestDataLoaderGrouping:
    def test_loader_uses_group_sampler_and_batches_homogeneous(self, rng):
        flag = rng.randint(0, 2, size=37)
        dl = DataLoader(_FakeDataset(flag), batch_size=4, num_workers=2,
                        collate_fn=_collate, seed=5)
        assert isinstance(dl.sampler, GroupSampler)
        batches = list(dl)
        assert len(batches) == len(dl)
        for b in batches:
            assert len(set(b["group"])) == 1

    def test_loader_resume_replays_same_epoch(self, rng):
        flag = rng.randint(0, 2, size=24)
        mk = lambda: DataLoader(_FakeDataset(flag), batch_size=4,
                                num_workers=1, collate_fn=_collate, seed=9)
        dl1, dl2 = mk(), mk()
        dl1.set_epoch(2)
        dl2.set_epoch(2)  # fresh process resuming into epoch 2
        seq1 = [tuple(b["idx"]) for b in dl1]
        seq2 = [tuple(b["idx"]) for b in dl2]
        assert seq1 == seq2
        dl2.set_epoch(3)
        assert seq1 != [tuple(b["idx"]) for b in dl2]

    def test_single_group_dataset_keeps_epoch_sampler(self):
        dl = DataLoader(_FakeDataset(np.zeros(16, np.int64)), batch_size=4,
                        collate_fn=_collate)
        assert isinstance(dl.sampler, EpochSampler)

    def test_slow_consumer_backpressure(self, rng):
        """A consumer slower than the workers must still receive every
        batch exactly once (bounded prefetch queue, no drops/dups)."""
        import time

        flag = rng.randint(0, 2, size=32)
        dl = DataLoader(_FakeDataset(flag), batch_size=2, num_workers=4,
                        prefetch=2, collate_fn=_collate, seed=1)
        seen = []
        for b in dl:
            time.sleep(0.01)
            seen.extend(b["idx"])
        expect = dl.sampler.indices(0)
        assert sorted(seen) == sorted(expect.tolist())


class TestConcatRepeat:
    def test_concat_flags_and_indexing(self, rng):
        from partner_tpu.data.datasets import ConcatDataset

        a, b = _FakeDataset(np.zeros(5, np.int64)), _FakeDataset(
            np.zeros(7, np.int64))
        cd = ConcatDataset([a, b])
        assert len(cd) == 12
        assert len(np.unique(cd.flag)) == 2
        assert cd[0]["idx"] == 0 and cd[5]["idx"] == 0 and cd[11]["idx"] == 6
        # loader over the concat batches within one source at a time
        dl = DataLoader(cd, batch_size=2, num_workers=1,
                        collate_fn=_collate, seed=0)
        assert isinstance(dl.sampler, GroupSampler)

    def test_three_source_flags_never_collide(self):
        """Sources with different group counts must get disjoint flag id
        ranges (cumulative offsets; per-source i*offset collides)."""
        from partner_tpu.data.datasets import ConcatDataset

        a = _FakeDataset(np.zeros(4, np.int64))              # 1 group
        b = _FakeDataset(np.arange(10, dtype=np.int64))      # 10 groups
        c = _FakeDataset(np.arange(5, dtype=np.int64))       # 5 groups
        cd = ConcatDataset([a, b, c])
        na, nb, nc = len(a), len(b), len(c)
        fa, fb, fc = (cd.flag[:na], cd.flag[na:na + nb],
                      cd.flag[na + nb:])
        assert not (set(fa) & set(fb)), (fa, fb)
        assert not (set(fb) & set(fc)), (fb, fc)
        assert not (set(fa) & set(fc)), (fa, fc)
        assert len(np.unique(cd.flag)) == 16

    def test_repeat_tiles_flag(self):
        from partner_tpu.data.datasets import RepeatDataset

        base = _FakeDataset(np.array([0, 1], np.int64))
        rd = RepeatDataset(base, 3)
        assert len(rd) == 6
        np.testing.assert_array_equal(rd.flag, [0, 1] * 3)
        assert rd[4]["idx"] == 0
