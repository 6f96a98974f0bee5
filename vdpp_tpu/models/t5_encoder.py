"""T5 text encoder (encoder-only, relative-position attention), functional JAX.

Text-conditioned video DiTs (CogVideoX family — the model class behind this
framework's ``joint3d`` attention mode) condition on T5 token embeddings
rather than the reference's CLIP image embedding
(reference: scripts/generate_video_demo.py:110-115 encodes with CLIP only).
This is the first-party encoder for that path; the default preset is the
T5-v1.1-XXL shape CogVideoX ships.

Architecture notes (matching HF ``T5EncoderModel`` exactly — golden-tested
against transformers' torch implementation in
tests/test_t5_transformers_parity.py):

* pre-RMSNorm blocks, every linear bias-free;
* self-attention WITHOUT the 1/sqrt(d) logit scale (T5 folds it into the
  initialization) plus a learned bucketed relative-position bias held by
  block 0 and shared by all layers;
* feed-forward is either ReLU (original T5) or gated-GELU (v1.1);
* fp32 norm statistics and softmax, bf16 matmuls (house precision rules).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vdpp_tpu.ops.linear import init_linear, linear
from vdpp_tpu.ops.normalization import init_rms_norm, rms_norm


@dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_buckets: int = 32
    relative_max_distance: int = 128
    feed_forward_proj: str = "gated-gelu"  # "relu" | "gated-gelu"
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16

    def __post_init__(self):
        if self.feed_forward_proj not in ("relu", "gated-gelu"):
            raise ValueError(f"unknown feed_forward_proj {self.feed_forward_proj!r}")

    @classmethod
    def xxl(cls, dtype=jnp.bfloat16) -> "T5EncoderConfig":
        """google/t5-v1_1-xxl — the CogVideoX text encoder (4.7 B params)."""
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "T5EncoderConfig":
        return cls(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, relative_buckets=8, relative_max_distance=16,
            dtype=dtype,
        )

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


from vdpp_tpu.models._common import FreshKeys as _Keys  # noqa: E402


def hash_tokenize(prompt: str, vocab_size: int, max_tokens: int = 64) -> list[int]:
    """Deterministic placeholder tokenizer for random-weight runs: one
    token per whitespace word, hashed into the vocab (id 0 reserved;
    terminated by the top id as an EOS stand-in). Real T5 tokenization
    needs the sentencepiece vocab that ships with a checkpoint."""
    import hashlib

    ids = [
        int(hashlib.sha256(w.encode()).hexdigest(), 16) % (vocab_size - 2) + 1
        for w in prompt.split()[: max_tokens - 1]
    ]
    return ids + [vocab_size - 1]


def relative_position_buckets(
    q_len: int, k_len: int, num_buckets: int, max_distance: int
) -> jax.Array:
    """Bidirectional T5 relative-position bucketing, (q_len, k_len) int32.

    Half the buckets encode sign; within each half, small offsets get exact
    buckets and larger ones log-spaced buckets up to ``max_distance``.
    """
    ctx = jnp.arange(q_len, dtype=jnp.int32)[:, None]
    mem = jnp.arange(k_len, dtype=jnp.int32)[None, :]
    rel = mem - ctx  # key - query
    half = num_buckets // 2
    buckets = jnp.where(rel > 0, half, 0)
    rel_abs = jnp.abs(rel)
    max_exact = half // 2
    is_small = rel_abs < max_exact
    rel_large = max_exact + (
        jnp.log(rel_abs.astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, half - 1)
    return buckets + jnp.where(is_small, rel_abs, rel_large)


class T5TextEncoder:
    """init/apply; ``apply(params, input_ids, attention_mask)`` returns the
    final-norm hidden states (B, L, d_model) — the conditioning tokens a
    text-to-video DiT cross-attends."""

    def __init__(self, config: T5EncoderConfig | None = None):
        self.config = config or T5EncoderConfig.xxl()

    def init(self, key: jax.Array) -> dict:
        cfg = self.config
        kg = _Keys(key)
        d, inner = cfg.d_model, cfg.inner_dim
        params: dict = {
            "embed": (
                jax.random.normal(kg(), (cfg.vocab_size, d), jnp.float32)
            ).astype(cfg.dtype),
            "rel_bias": (
                jax.random.normal(kg(), (cfg.relative_buckets, cfg.num_heads),
                                  jnp.float32) * 0.1
            ).astype(cfg.dtype),
            "blocks": [],
            "final_ln": init_rms_norm(d, cfg.dtype),
        }
        for _ in range(cfg.num_layers):
            blk = {
                "ln1": init_rms_norm(d, cfg.dtype),
                "q": init_linear(kg(), d, inner, cfg.dtype, use_bias=False),
                "k": init_linear(kg(), d, inner, cfg.dtype, use_bias=False),
                "v": init_linear(kg(), d, inner, cfg.dtype, use_bias=False),
                "o": init_linear(kg(), inner, d, cfg.dtype, use_bias=False),
                "ln2": init_rms_norm(d, cfg.dtype),
                "wo": init_linear(kg(), cfg.d_ff, d, cfg.dtype, use_bias=False),
            }
            if cfg.feed_forward_proj == "gated-gelu":
                blk["wi0"] = init_linear(kg(), d, cfg.d_ff, cfg.dtype, use_bias=False)
                blk["wi1"] = init_linear(kg(), d, cfg.d_ff, cfg.dtype, use_bias=False)
            else:
                blk["wi"] = init_linear(kg(), d, cfg.d_ff, cfg.dtype, use_bias=False)
            params["blocks"].append(blk)
        return params

    def apply(
        self,
        params: dict,
        input_ids: jax.Array,
        attention_mask: jax.Array | None = None,
    ) -> jax.Array:
        """input_ids (B, L) int32; attention_mask (B, L) with 1 = attend.

        Returns (B, L, d_model) final hidden states (post final RMSNorm).
        """
        cfg = self.config
        b, l = input_ids.shape
        h_heads, dk = cfg.num_heads, cfg.d_kv

        x = jnp.take(params["embed"], input_ids, axis=0)  # (B, L, D)

        # Position bias: shared by every layer (block-0 parameter in T5).
        buckets = relative_position_buckets(
            l, l, cfg.relative_buckets, cfg.relative_max_distance
        )
        pos_bias = jnp.take(params["rel_bias"], buckets, axis=0)  # (L, L, H)
        bias = pos_bias.astype(jnp.float32).transpose(2, 0, 1)[None]  # (1, H, L, L)
        if attention_mask is not None:
            neg = jnp.asarray(-1e9, jnp.float32)
            bias = bias + jnp.where(
                attention_mask[:, None, None, :].astype(bool), 0.0, neg
            )

        def attn(blk, h):
            q = linear(h, blk["q"]).reshape(b, l, h_heads, dk)
            k = linear(h, blk["k"]).reshape(b, l, h_heads, dk)
            v = linear(h, blk["v"]).reshape(b, l, h_heads, dk)
            # T5: NO 1/sqrt(d) scale on the logits.
            logits = jnp.einsum(
                "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
            ) + bias
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum(
                "bhlm,bmhd->blhd", w, v, preferred_element_type=jnp.float32
            ).astype(h.dtype)
            return linear(out.reshape(b, l, cfg.inner_dim), blk["o"])

        for blk in params["blocks"]:
            x = x + attn(blk, rms_norm(x, blk["ln1"], cfg.layer_norm_eps))
            hh = rms_norm(x, blk["ln2"], cfg.layer_norm_eps)
            if cfg.feed_forward_proj == "gated-gelu":
                gate = jax.nn.gelu(
                    linear(hh, blk["wi0"]).astype(jnp.float32), approximate=True
                ).astype(x.dtype)
                hh = gate * linear(hh, blk["wi1"])
            else:
                hh = jax.nn.relu(linear(hh, blk["wi"]))
            x = x + linear(hh, blk["wo"])

        return rms_norm(x, params["final_ln"], cfg.layer_norm_eps)
