import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from partner_tpu.losses import matcher


def random_instance(rng, n_queries, m_gt, ncls=1, m_valid=None):
    logits = rng.randn(n_queries, ncls).astype(np.float32)
    preds = rng.randn(n_queries, 8).astype(np.float32)
    gt_cls = rng.randint(0, ncls, m_gt).astype(np.int32)
    gt_enc = rng.randn(m_gt, 8).astype(np.float32)
    mask = np.zeros(m_gt, bool)
    mask[: (m_valid if m_valid is not None else m_gt)] = True
    return logits, preds, gt_cls, gt_enc, mask


class TestAuctionMatcher:
    def test_matches_scipy_on_random_instances(self, rng):
        cw = jnp.ones(8)
        for seed in range(5):
            r = np.random.RandomState(seed)
            logits, preds, gt_cls, gt_enc, mask = random_instance(r, 256, 12)
            benefit = np.asarray(matcher.matching_benefit(
                jnp.asarray(logits), jnp.asarray(preds), jnp.asarray(gt_cls),
                jnp.asarray(gt_enc), jnp.asarray(mask), cw,
            ))
            rows, cols = linear_sum_assignment(-benefit)
            exp_total = benefit[rows, cols].sum()

            got = np.asarray(matcher.assign_auction(
                jnp.asarray(logits)[None], jnp.asarray(preds)[None],
                jnp.asarray(gt_cls)[None], jnp.asarray(gt_enc)[None],
                jnp.asarray(mask)[None], cw,
            ))[0]
            assert (got >= 0).all()
            assert len(set(got.tolist())) == len(got)  # distinct queries
            got_total = benefit[np.arange(12), got].sum()
            # epsilon-auction is within m*eps of optimal
            assert got_total >= exp_total - 12 * 1e-3

    def test_padded_gts_unassigned(self, rng):
        cw = jnp.ones(8)
        logits, preds, gt_cls, gt_enc, mask = random_instance(
            rng, 128, 16, m_valid=5
        )
        got = np.asarray(matcher.assign_auction(
            jnp.asarray(logits)[None], jnp.asarray(preds)[None],
            jnp.asarray(gt_cls)[None], jnp.asarray(gt_enc)[None],
            jnp.asarray(mask)[None], cw,
        ))[0]
        assert (got[:5] >= 0).all()
        assert (got[5:] == -1).all()

    def test_scipy_callback_exact(self, rng):
        cw = jnp.ones(8)
        logits, preds, gt_cls, gt_enc, mask = random_instance(rng, 64, 8)
        benefit = np.asarray(matcher.matching_benefit(
            jnp.asarray(logits), jnp.asarray(preds), jnp.asarray(gt_cls),
            jnp.asarray(gt_enc), jnp.asarray(mask), cw,
        ))
        rows, cols = linear_sum_assignment(-benefit)
        got = np.asarray(matcher.assign_scipy(
            jnp.asarray(logits)[None], jnp.asarray(preds)[None],
            jnp.asarray(gt_cls)[None], jnp.asarray(gt_enc)[None],
            jnp.asarray(mask)[None], cw,
        ))[0]
        exp = np.full(8, -1)
        exp[rows] = cols
        np.testing.assert_array_equal(got, exp)

    def test_perfect_prediction_matches_identity(self, rng):
        """Queries placed exactly at gt encodings must match themselves."""
        cw = jnp.ones(8)
        m = 6
        gt_enc = rng.randn(m, 8).astype(np.float32) * 3
        preds = rng.randn(64, 8).astype(np.float32) * 3
        target_slots = np.arange(0, 60, 10)
        preds[target_slots] = gt_enc
        logits = np.full((64, 1), -4.0, np.float32)
        logits[target_slots] = 4.0
        got = np.asarray(matcher.assign_auction(
            jnp.asarray(logits)[None], jnp.asarray(preds)[None],
            jnp.zeros((1, m), jnp.int32), jnp.asarray(gt_enc)[None],
            jnp.ones((1, m), bool), cw,
        ))[0]
        np.testing.assert_array_equal(got, target_slots)
