"""CenterNet losses (FastFocal + Reg) in jnp.

Mirrors /root/reference/det3d/models/losses/centernet_loss.py:6-54 with NHWC
maps: heatmaps (B, H, W, C) flattened to (B, H*W, C), index convention
``ind = az * n_r + r`` (matching the host target assigner).
"""

import jax.numpy as jnp


def _gather_feat(feat, ind):
    """feat (B, HW, C), ind (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(feat, ind[..., None], axis=1)


def fast_focal_loss(out, target, ind, mask, cat):
    """CornerNet focal loss.

    out/target: (B, H, W, C) with out already sigmoid-clamped;
    ind/mask/cat: (B, M).
    """
    b = out.shape[0]
    mask = mask.astype(out.dtype)
    gt_weight = jnp.power(1 - target, 4)
    neg_loss = (jnp.log(1 - out) * jnp.power(out, 2) * gt_weight).sum()

    flat = out.reshape(b, -1, out.shape[-1])
    pos_pred = jnp.take_along_axis(
        _gather_feat(flat, ind), cat[..., None], axis=2
    )[..., 0]  # (B, M)
    num_pos = mask.sum()
    pos_loss = (jnp.log(pos_pred) * jnp.power(1 - pos_pred, 2) * mask).sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_loss(output, mask, ind, target):
    """L1 regression at peak cells; returns per-dim loss (D,).

    output (B, H, W, D); mask/ind (B, M); target (B, M, D).
    """
    b, h, w, d = output.shape
    pred = _gather_feat(output.reshape(b, h * w, d), ind)
    m = mask.astype(output.dtype)[..., None]
    loss = jnp.abs(pred * m - target * m)
    loss = loss / (m.sum() + 1e-4)
    return loss.sum(axis=(0, 1))


def sigmoid_focal_loss(logits, target_one_hot, gamma=2.0, alpha=0.25):
    """E2ESigmoidFocalClassificationLoss with reduction='sum'
    (loss_utils.py:447-504)."""
    pred = jnp.clip(jnp.exp(-jnp.logaddexp(0.0, -logits)), 1e-12, 1 - 1e-12)
    alpha_w = target_one_hot * alpha + (1 - target_one_hot) * (1 - alpha)
    pt = target_one_hot * (1 - pred) + (1 - target_one_hot) * pred
    bce = jnp.clip(logits, min=0) - logits * target_one_hot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return (alpha_w * jnp.power(pt, gamma) * bce).sum()


def smooth_l1(x, sigma=3.0):
    """Per-element smooth L1 with transition at 1/sigma^2
    (loss_utils.py:506-536)."""
    sigma2 = sigma ** 2
    absx = jnp.abs(x)
    return jnp.where(
        absx < 1.0 / sigma2, 0.5 * (sigma * x) ** 2, absx - 0.5 / sigma2
    )
