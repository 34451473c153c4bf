"""Caption grounding loss: bidirectional image-caption contrastive loss.

TPU-native equivalent of the reference ``grounding_loss``
(open_set/models/losses/grounding_loss.py:9-77). Semantics preserved:

- word->query (l2v) and query->word (v2l) attention over the local
  similarity matrix between caption-noun embeddings and query embeddings,
- attention-weighted distances aggregated to a BxB image-caption distance
  matrix (all pairs, not just matching ones),
- 4-way InfoNCE: log-softmax over rows and columns of both distance
  matrices, mean of the diagonal terms,
- captions with zero tokens are pushed out of the softmax with a detached
  max()+100 distance (reference :53-62).

TPU-first: under pjit, this function receives the GLOBAL batch, so the
reference's explicit ``dist.all_gather`` of captions/predictions across
ranks (mask2former_head.py:650-684) is unnecessary — XLA partitions the
BxB computation and inserts the collectives itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grounding_loss(
    cls_emb_pred: jnp.ndarray,  # (B, Q, d)
    caption_embs: jnp.ndarray,  # (B, T, d)
    caption_mask: jnp.ndarray,  # (B, T), 1 = valid token
    temperature: float,
) -> jnp.ndarray:
    b, q, d = cls_emb_pred.shape
    t = caption_embs.shape[1]
    caption_mask = caption_mask.astype(jnp.float32)
    num_tokens = caption_mask.sum(axis=1)  # (B,)

    # all image-caption pairs: caption i vs image j
    # local_similarity[i, j, t, q] = <word_t of caption i, query_q of image j>
    sim = jnp.einsum(
        "itd,jqd->ijtq",
        caption_embs.astype(jnp.float32),
        cls_emb_pred.astype(jnp.float32),
    )
    dist = -sim / temperature
    sim = sim / temperature

    attn_l2v = jax.nn.softmax(sim, axis=3)  # over queries
    attn_v2l = jax.nn.softmax(sim, axis=2)  # over words

    attn_l2v = attn_l2v * caption_mask[:, None, :, None]
    denom = jnp.maximum(num_tokens, 1.0)[:, None]
    global_dist_l2v = (attn_l2v * dist).sum(axis=(2, 3)) / denom  # (B, B)
    global_dist_v2l = (attn_v2l * dist).sum(axis=(2, 3)) / q  # (B, B)

    has_tokens = (num_tokens > 0)[:, None]  # (B, 1) broadcast over images

    def _masked(dmat):
        filler = jax.lax.stop_gradient(dmat.max()) + 100.0
        return jnp.where(has_tokens, dmat, filler)

    def _nce(dmat):
        # rows: captions, cols: images; diagonal is the matching pair
        lc = jax.nn.log_softmax(-dmat, axis=0)
        li = jax.nn.log_softmax(-dmat, axis=1)
        return (-jnp.diag(lc)).mean() + (-jnp.diag(li)).mean()

    loss = _nce(_masked(global_dist_l2v)) + _nce(_masked(global_dist_v2l))
    return loss / 4.0
