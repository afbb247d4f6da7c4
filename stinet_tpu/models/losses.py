"""Loss functions — parity with /root/reference/models/losses/losses.py
(cse_loss, total_variation_loss, dice_loss) plus the weighted cross entropy
used by the segmentation trainer. Images are NHWC here (TPU layout) vs the
reference's NCHW; formulas are normalized identically."""
import jax
import jax.numpy as jnp


def cse_loss_terms(logits, targets, weights=None, ignore_index=None,
                   valid_mask=None):
    """Weighted-CE numerator/denominator (wsum, wnorm): loss =
    wsum / max(wnorm, eps). Exposed separately so data-parallel layouts can
    combine per-shard terms exactly (sum both, divide once — wnorm is
    parameter-independent, so grads combine the same way)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
    w = jnp.ones_like(nll)
    if weights is not None:
        w = w * jnp.take(weights, targets, mode="clip")
    if ignore_index is not None:
        w = w * (targets != ignore_index)
    if valid_mask is not None:
        w = w * valid_mask
    return jnp.sum(nll * w), jnp.sum(w)


def cse_loss(logits, targets, weights=None, ignore_index=None,
             valid_mask=None):
    """CrossEntropyLoss over [N, C] logits and int targets, with optional
    per-class weights and ignore_index (torch semantics: weighted mean =
    sum(w_t * nll) / sum(w_t) over non-ignored rows)."""
    wsum, wnorm = cse_loss_terms(logits, targets, weights, ignore_index,
                                 valid_mask)
    return wsum / jnp.maximum(wnorm, 1e-8)


def total_variation_loss(img, weight):
    """img: [B, H, W, C]; squared-difference TV normalized by numel
    (reference losses.py:11-15)."""
    b, h, w, c = img.shape
    tv_h = jnp.sum((img[:, 1:, :, :] - img[:, :-1, :, :]) ** 2)
    tv_w = jnp.sum((img[:, :, 1:, :] - img[:, :, :-1, :]) ** 2)
    return weight * (tv_h + tv_w) / (b * h * w * c)


def dice_loss(logits, true, eps=1e-7):
    """Multiclass Sørensen–Dice loss; logits [N, C] (or [B, H, W, C]),
    true int labels of matching leading shape."""
    num_classes = logits.shape[-1]
    flat_logits = logits.reshape(-1, num_classes)
    flat_true = true.reshape(-1)
    one_hot = jax.nn.one_hot(flat_true, num_classes, dtype=flat_logits.dtype)
    probas = jax.nn.softmax(flat_logits, axis=-1)
    intersection = jnp.sum(probas * one_hot, axis=0)
    cardinality = jnp.sum(probas + one_hot, axis=0)
    dice = jnp.mean(2.0 * intersection / (cardinality + eps))
    return 1.0 - dice
