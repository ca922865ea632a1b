"""The Aha multi-part training loss, as pure jnp.

Exact semantics of the reference forward
(`/root/reference/models/live_llava/video_head_live_llava_qwen.py:185-281`):

    loss = lm_w * CE(logits, shifted_labels)
         + video_w * ( info_w * CE(informative_logits, informative_labels)
                     + rel_w  * ( SmoothL1(relevance, rel_labels) + tv_w * TV )
                     + unc_w  * clamp(GaussianNLL - 1e-3 * std(log_var), min=0) )

Reference quirks reproduced deliberately:
  * TV term: the ref computes a *scalar* mean over all adjacent diffs and
    then multiplies by sum(tv_mask)/(sum(tv_mask)+1e-6) (the per-element
    masking is dead code — `tv_mask.mul(...)` result is discarded at :231).
  * SmoothL1 only applies with > 1 valid relevance label, else 0.
  * Gaussian NLL uses log-variance clamped to [-4, 1.5], eps 1e-6, and the
    diversity bonus is the *unbiased* std over every position (valid or not).
  * The all-labels-invalid DeepSpeed guards (:196-197, :212-214, :222-224)
    become mask arithmetic: inject one synthetic label when a batch has none
    (label[:,0]=input_ids[:,1] for LM, 0 for the heads).

All reductions are mask-weighted sums with safe denominators, so the same
compiled graph handles every batch composition — no data-dependent branches.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from aha_tpu.config import LossWeights

IGNORE = -100


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LossParts:
    total: jnp.ndarray
    lm: jnp.ndarray
    video: jnp.ndarray
    info: jnp.ndarray
    relevance: jnp.ndarray
    tv: jnp.ndarray
    uncertainty: jnp.ndarray


def _masked_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over labels != IGNORE ([.., V] logits, [..] labels)."""
    valid = labels != IGNORE
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    count = valid.sum()
    return jnp.where(valid, nll, 0.0).sum() / jnp.maximum(count, 1)


def _smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise SmoothL1 with beta=1 (torch default)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def _inject_if_empty(labels: jnp.ndarray, fill: jnp.ndarray) -> jnp.ndarray:
    """If no label in the whole batch is valid, set [:, 0] = fill
    (the ref's DeepSpeed-hang guard)."""
    any_valid = jnp.any(labels != IGNORE)
    injected = labels.at[:, 0].set(fill)
    return jnp.where(any_valid, labels, injected)


def aha_loss(
    logits: jnp.ndarray,              # [B, T, V] lm logits
    informative_logits: jnp.ndarray,  # [B, T, 2]
    relevance: jnp.ndarray,           # [B, T] post-sigmoid
    log_variance: jnp.ndarray,        # [B, T]
    *,
    input_ids: jnp.ndarray,           # [B, T] (for the lm guard)
    labels: jnp.ndarray | None,       # [B, T] already shifted by the collator
    informative_labels: jnp.ndarray | None,  # [B, T] int, -100 unlearned
    relevance_labels: jnp.ndarray | None,    # [B, T] float, -100 unlearned
    weights: LossWeights,
) -> LossParts:
    zero = jnp.float32(0.0)
    lm = info = rel = tv = unc = zero

    if labels is not None:
        labels = _inject_if_empty(labels, input_ids[:, 1])
        lm = _masked_ce(logits, labels)

    if informative_labels is not None:
        informative_labels = _inject_if_empty(informative_labels, 0)
        info = _masked_ce(informative_logits, informative_labels)

    if relevance_labels is not None:
        relevance_labels = _inject_if_empty(
            relevance_labels, jnp.float32(0.0)
        )
        valid = relevance_labels != IGNORE
        rl = jnp.where(valid, relevance_labels, 0.0).astype(jnp.float32)
        rv = relevance.astype(jnp.float32)
        count = valid.sum()

        # TV smoothness: scalar mean over ALL adjacent pairs, modulated by
        # the ref's sum(mask)/(sum(mask)+1e-6) factor
        if relevance.shape[1] > 1:
            diff2 = (rv[:, 1:] - rv[:, :-1]) ** 2
            tv_mask = valid[:, 1:]
            tv_scalar = diff2.mean()
            tv = tv_scalar * tv_mask.sum() / (tv_mask.sum() + 1e-6)

        sl1 = jnp.where(valid, _smooth_l1(rv, rl), 0.0).sum() / jnp.maximum(count, 1)
        rel = jnp.where(count > 1, sl1, 0.0)

        # Gaussian NLL with clamped log-variance. Reference quirk
        # (video_head_live_llava_qwen.py:261-266): residual is [n] but
        # variance_valid is [n, 1] (log_variance keeps its trailing head
        # dim), so `residual**2 / (2*variance_valid + 1e-6)` broadcasts to
        # an [n, n] OUTER matrix and `.mean()` averages all n^2 pairs —
        # every variance is paired with the MEAN squared residual, not its
        # own position's. Closed form of that outer mean:
        #   mean_i [ mse_mean / (2 v_i + 1e-6) + 0.5 log(2 pi v_i) ]
        lv = jnp.clip(log_variance.astype(jnp.float32), -4.0, 1.5)
        var = jnp.exp(lv)
        residual2 = (rl - rv) ** 2
        mse_mean = jnp.where(valid, residual2, 0.0).sum() / jnp.maximum(count, 1)
        nll = mse_mean / (2 * var + 1e-6) + 0.5 * jnp.log(2 * math.pi * var)
        nll_mean = jnp.where(valid, nll, 0.0).sum() / jnp.maximum(count, 1)
        # unbiased std over every position (ref torch.std default)
        n = lv.size
        lv_std = jnp.sqrt(jnp.maximum(((lv - lv.mean()) ** 2).sum() / jnp.maximum(n - 1, 1), 0.0))
        unc = jnp.maximum(nll_mean - 1e-3 * lv_std, 0.0)

    rel_with_tv = rel + weights.tv * tv
    video = weights.info * info + weights.relevance * rel_with_tv + weights.uncertainty * unc
    total = weights.lm * lm + weights.video * video
    return LossParts(total=total, lm=lm, video=video, info=info,
                     relevance=rel, tv=tv, uncertainty=unc)
