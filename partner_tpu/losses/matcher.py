"""Set-prediction matcher: product-of-losses cost + on-device assignment.

The reference TimeMatcher (/root/reference/det3d/models/e2e_utils/
matcher.py:8-154) builds, per scene, a cost over (queries x gts)

    cost[n, m] = -( prob_n[class_m] ** w_ce  *  exp(-||w_code*(pred_n -
                  enc(gt_m))||_1) ** w_bbox )

and ships it to scipy's Hungarian solver on the CPU — a per-step host sync.
Here the assignment runs on device:

  1. candidate pruning — each gt keeps its top-C highest-benefit queries
     (benefit computed in gt-chunks so the (N_queries x M) matrix is never
     materialized);
  2. epsilon-auction over the candidate lists: unassigned gts bid
     simultaneously for their best remaining query; ties are resolved by
     price escalation. Bounded iterations, while_loop, all fixed shapes.

An exact scipy fallback via jax.pure_callback is provided for bit-parity
testing (``assign_scipy``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


def matching_benefit(pred_logits, pred_boxes, gt_classes, gt_encoded, gt_mask,
                     code_weights, w_ce=0.25, w_bbox=0.75):
    """Per-pair benefit (M, N) for ONE scene, computed gt-major.

    pred_logits (N, ncls) raw; pred_boxes (N, code); gt_encoded (M, code);
    gt_classes (M,) 0-based; gt_mask (M,).
    Benefit = prob^w_ce * exp(-L1)^w_bbox; invalid gts get NEG row.
    """
    prob = jax.nn.sigmoid(pred_logits)  # (N, ncls)
    wp = pred_boxes * code_weights  # (N, code)

    def per_gt(cls, enc, valid):
        l1 = jnp.abs(wp - enc * code_weights).sum(-1)  # (N,)
        ce = prob[:, cls]
        benefit = jnp.power(ce, w_ce) * jnp.power(jnp.exp(-l1), w_bbox)
        return jnp.where(valid, benefit, NEG)

    return jax.vmap(per_gt)(gt_classes, gt_encoded, gt_mask)  # (M, N)


def _topc_candidates(benefit, c):
    # small scenes can have fewer queries than the candidate budget
    vals, idx = jax.lax.top_k(benefit, min(c, benefit.shape[-1]))  # (M, C)
    return vals, idx


def auction_assign(cand_benefit, cand_idx, gt_mask, num_queries, eps=1e-4,
                   max_iters=3000):
    """Forward auction on candidate lists.

    cand_benefit (M, C), cand_idx (M, C) original query ids, gt_mask (M,).
    Returns assigned query id per gt (M,), -1 where unassigned/invalid.
    """
    m, c = cand_benefit.shape

    def cond(state):
        assigned, prices, owner, it = state
        open_rows = (assigned < 0) & gt_mask
        return (it < max_iters) & jnp.any(open_rows)

    def body(state):
        assigned, prices, owner, it = state
        open_rows = (assigned < 0) & gt_mask

        values = cand_benefit - prices[cand_idx]  # (M, C)
        values = jnp.where(open_rows[:, None], values, NEG)
        # top-2 per row
        v1 = jnp.max(values, axis=1)
        j1 = jnp.argmax(values, axis=1)
        values2 = values.at[jnp.arange(m), j1].set(NEG)
        v2 = jnp.max(values2, axis=1)
        bid_col = cand_idx[jnp.arange(m), j1]  # (M,)
        bid_amt = v1 - v2 + eps

        bidding = open_rows & (v1 > NEG / 2)
        # winner per column: encode (bid_amt, row) and take segment max
        order = jnp.argsort(jnp.where(bidding, bid_amt, -jnp.inf))
        # scatter rows in ascending bid order; the last (highest) write wins
        col_of = jnp.where(bidding, bid_col, num_queries)[order]
        row_of = jnp.arange(m)[order]
        amt_of = bid_amt[order]

        win_row = jnp.full((num_queries + 1,), -1, jnp.int32).at[col_of].set(
            row_of.astype(jnp.int32)
        )
        win_amt = jnp.zeros((num_queries + 1,)).at[col_of].set(amt_of)

        won = (win_row[bid_col] == jnp.arange(m)) & bidding  # (M,)
        won_col = jnp.where(won, bid_col, num_queries)

        # evict previous owners of won columns
        prev_owner = owner[won_col]  # (M,) row id or -1
        evicted = jnp.full((m + 1,), False).at[
            jnp.where(prev_owner >= 0, prev_owner, m)
        ].set(True)[:m]
        assigned = jnp.where(evicted, -1, assigned)

        # record winners
        assigned = jnp.where(won, bid_col, assigned)
        owner = owner.at[won_col].set(
            jnp.where(won, jnp.arange(m), -1).astype(jnp.int32), mode="drop"
        )
        prices = prices.at[won_col].add(
            jnp.where(won, win_amt[won_col], 0.0), mode="drop"
        )
        return assigned, prices, owner, it + 1

    init = (
        jnp.full((m,), -1, jnp.int32),
        jnp.zeros((num_queries + 1,)),
        jnp.full((num_queries + 1,), -1, jnp.int32),
        jnp.int32(0),
    )
    assigned, _, _, _ = jax.lax.while_loop(cond, body, init)
    return jnp.where(gt_mask, assigned, -1)


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def assign_auction(pred_logits, pred_boxes, gt_classes, gt_encoded, gt_mask,
                   code_weights, num_candidates=32):
    """Batched device assignment. Inputs are batched (B, ...); returns
    (B, M) matched query id per gt (-1 invalid)."""

    def one(pl, pb, gc, ge, gm):
        benefit = matching_benefit(pl, pb, gc, ge, gm, code_weights)
        vals, idx = _topc_candidates(benefit, num_candidates)
        return auction_assign(vals, idx, gm, pl.shape[0])

    return jax.vmap(one)(pred_logits, pred_boxes, gt_classes, gt_encoded,
                         gt_mask)


def _scipy_solve(cost, mask):
    from scipy.optimize import linear_sum_assignment

    out = np.full((cost.shape[0],), -1, np.int32)
    valid = np.asarray(mask)
    c = np.asarray(cost)[valid]
    if c.shape[0]:
        rows, cols = linear_sum_assignment(c)
        out[np.flatnonzero(valid)[rows]] = cols
    return out


def assign_scipy(pred_logits, pred_boxes, gt_classes, gt_encoded, gt_mask,
                 code_weights):
    """Exact Hungarian via host callback (parity mode; per-step host sync,
    like the reference matcher.py:147)."""

    def one(pl, pb, gc, ge, gm):
        benefit = matching_benefit(pl, pb, gc, ge, gm, code_weights)
        cost = -benefit  # (M, N)
        return jax.pure_callback(
            _scipy_solve,
            jax.ShapeDtypeStruct((gc.shape[0],), jnp.int32),
            cost, gm, vmap_method="sequential",
        )

    return jax.vmap(one)(pred_logits, pred_boxes, gt_classes, gt_encoded,
                         gt_mask)
