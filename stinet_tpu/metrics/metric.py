"""Classification metrics — parity with /root/reference/utils/metrics/
metric.py:4-20 (accuracy, top-k accuracy), jit-friendly with valid masks."""
import jax.numpy as jnp


def accuracy(logits, target, valid_mask=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == target).astype(jnp.float32)
    if valid_mask is not None:
        return jnp.sum(correct * valid_mask) / jnp.maximum(
            jnp.sum(valid_mask), 1.0)
    return jnp.mean(correct)


def top_k_acc(logits, target, k=3, valid_mask=None):
    topk = jnp.argsort(logits, axis=-1)[..., -k:]
    correct = jnp.any(topk == target[..., None], axis=-1).astype(jnp.float32)
    if valid_mask is not None:
        return jnp.sum(correct * valid_mask) / jnp.maximum(
            jnp.sum(valid_mask), 1.0)
    return jnp.mean(correct)
