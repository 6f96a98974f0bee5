"""Text -> video generation (T5-conditioned DiT), end to end on the mesh.

The reference's only conditioning path is a CLIP image embedding
(reference: scripts/generate_video_demo.py:110-115); this app is the
text-conditioned counterpart for the DiT model family (CogVideoX/Latte
class): T5 text encoder -> cross-attended video DiT (factorized or
joint-3D attention) -> chunked temporal VAE decode.

Parallelism is selectable per run — the three axes this framework exposes:
  --num-stages S        step-pipeline over S stages (reference's axis)
  --seq-parallel P      token-axis sharding for SINGLE-sample latency
                        (beyond-reference; parallel/sequence_parallel.py)
  both                  (S, P) mesh: each stage is a P-way token group

Tokenization: real T5 tokenization needs the sentencepiece vocab that
ships with a checkpoint (no network egress here). With --checkpoint the
token ids should come from --token-ids / --token-ids-file; with
--random-weights a deterministic hash of the prompt words stands in so
the full graph executes.

Example (CPU mesh):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/generate_video_text.py --prompt "a red panda" \
        --random-weights --preset tiny --backend cpu \
        --num-frames 4 --steps 8 --num-stages 2 --seq-parallel 2
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGGER = logging.getLogger("vdpp.generate_text")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt", default="a video")
    p.add_argument("--negative-prompt", default=None,
                   help="condition the uncond CFG branch on this prompt's "
                        "encoding instead of zeros (standard negative-"
                        "prompt semantics; needs --guidance-scale)")
    p.add_argument("--negative-token-ids", default=None,
                   help="comma-separated token ids for the negative prompt "
                        "(overrides --negative-prompt hashing)")
    p.add_argument("--token-ids", default=None,
                   help="comma-separated token ids (overrides --prompt hashing)")
    p.add_argument("--token-ids-file", default=None,
                   help=".npy int array of token ids")
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--preset", default="xl", choices=["xl", "tiny"])
    p.add_argument("--attention-mode", default="joint3d",
                   choices=["factorized", "joint3d"])
    p.add_argument("--checkpoint", default=None,
                   help="converted weights dir (dit.npz/t5.npz/vae_decoder.npz)")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--num-frames", type=int, default=8)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--solver", default="euler",
                   choices=["euler", "euler_a", "heun", "dpmpp2m", "flowmatch"],
                   help="euler = reference semantics; heun = 2nd-order EDM "
                        "(2 DiT evals/step, use ~half the --steps); "
                        "dpmpp2m = 2nd-order multistep DPM-Solver++ "
                        "(1 eval/step, use ~half the --steps); flowmatch "
                        "= rectified-flow parameterization (shifted-"
                        "linear schedule, velocity prediction — the "
                        "SD3/CogVideoX-class convention; pair with a "
                        "flow-matching checkpoint)")
    p.add_argument("--flow-shift", type=float, default=3.0,
                   help="flowmatch only: resolution shift of the "
                        "sigma schedule (SD3 convention; 1.0 = plain "
                        "linear)")
    p.add_argument("--num-stages", type=int, default=None)
    p.add_argument("--seq-parallel", type=int, default=1)
    p.add_argument("--num-samples", type=int, default=1)
    p.add_argument("--guidance-scale", type=float, default=6.0)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--decode-chunk-frames", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--sampler-seed", type=int, default=0,
                   help="euler_a only: seed of the per-step injected "
                        "noise (construction-time; vary per run)")
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--log-level", default="INFO")
    return p


def hash_tokenize(prompt: str, vocab_size: int, max_tokens: int):
    """Deterministic placeholder tokenizer (vdpp_tpu.models.t5_encoder)."""
    from vdpp_tpu.models.t5_encoder import hash_tokenize as ht

    return ht(prompt, vocab_size, max_tokens)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from vdpp_tpu.models.dit import DiTVideoConfig, DiTVideoWrapper
    from vdpp_tpu.models.svd_wrapper import make_guidance_ramp
    from vdpp_tpu.models.t5_encoder import T5EncoderConfig, T5TextEncoder
    from vdpp_tpu.models.vae import TemporalVAEDecoder, VAEConfig
    from vdpp_tpu.parallel.mesh import (
        make_pipeline_mesh,
        make_seq_mesh,
        make_stage_seq_mesh,
    )
    from vdpp_tpu.parallel.pipeline import (
        PipelineConfig,
        StepPipeline,
        run_reference_single_device,
    )
    from vdpp_tpu.parallel.sequence_parallel import SequenceParallelRunner
    from vdpp_tpu.utils.logging import setup_logging
    from vdpp_tpu.utils.video_io import (
        build_output_name,
        frames_to_uint8,
        save_video_gif,
        save_video_mp4,
    )

    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    setup_logging(args.log_level)
    enable_persistent_cache()
    t_start = time.perf_counter()
    if not args.checkpoint and not args.random_weights:
        LOGGER.error("provide --checkpoint or --random-weights")
        return 1
    if (args.negative_prompt is not None or args.negative_token_ids) and (
        args.guidance_scale is None or args.guidance_scale <= 1.0
    ):
        # make_guidance_ramp returns None at <=1.0, which disables CFG —
        # the negative context would be encoded and then silently ignored.
        LOGGER.error(
            "--negative-prompt needs CFG: set --guidance-scale > 1.0 "
            "(got %s)", args.guidance_scale,
        )
        return 1

    tiny = args.preset == "tiny"
    if tiny:
        t5_cfg = T5EncoderConfig.tiny()
        dit_cfg = dataclasses.replace(
            DiTVideoConfig.tiny(),
            cross_attention_dim=t5_cfg.d_model,
            attention_mode=args.attention_mode,
        )
        vae_cfg = VAEConfig.tiny(jnp.float32)
        args.width, args.height = min(args.width, 64), min(args.height, 64)
    else:
        t5_cfg = T5EncoderConfig.xxl()
        dit_cfg = dataclasses.replace(
            DiTVideoConfig.latte_xl(),
            cross_attention_dim=t5_cfg.d_model,
            attention_mode=args.attention_mode,
        )
        vae_cfg = VAEConfig.svd(jnp.float32)

    spatial_down = 2 ** (len(vae_cfg.block_out_channels) - 1)
    lat_h, lat_w = args.height // spatial_down, args.width // spatial_down
    if lat_h % dit_cfg.patch_size or lat_w % dit_cfg.patch_size:
        LOGGER.error("latent %dx%d not divisible by patch size", lat_h, lat_w)
        return 1

    # ---- token ids ----
    if args.token_ids_file:
        ids = np.load(args.token_ids_file).astype(np.int32).reshape(1, -1)
    elif args.token_ids:
        ids = np.asarray(
            [int(t) for t in args.token_ids.split(",")], np.int32
        ).reshape(1, -1)
    else:
        ids = np.asarray(
            hash_tokenize(args.prompt, t5_cfg.vocab_size, args.max_tokens),
            np.int32,
        ).reshape(1, -1)
        if args.checkpoint:
            LOGGER.warning(
                "hash tokenizer with real weights — pass --token-ids for "
                "meaningful conditioning"
            )

    neg_ids = None
    if args.negative_token_ids:
        neg_ids = np.asarray(
            [int(t) for t in args.negative_token_ids.split(",")], np.int32
        ).reshape(1, -1)
    elif args.negative_prompt is not None:
        neg_ids = np.asarray(
            hash_tokenize(args.negative_prompt, t5_cfg.vocab_size,
                          args.max_tokens),
            np.int32,
        ).reshape(1, -1)
    if neg_ids is not None:
        # The cfg-parallel axis selects the per-device context by value,
        # which needs equal token counts: right-pad the shorter id list
        # with EOS (the hash tokenizer's terminator, vocab_size - 1).
        eos = t5_cfg.vocab_size - 1
        want = max(ids.shape[1], neg_ids.shape[1])
        ids = np.pad(ids, ((0, 0), (0, want - ids.shape[1])),
                     constant_values=eos)
        neg_ids = np.pad(neg_ids, ((0, 0), (0, want - neg_ids.shape[1])),
                         constant_values=eos)

    # ---- models ----
    t0 = time.perf_counter()
    t5 = T5TextEncoder(t5_cfg)
    wrapper = DiTVideoWrapper(dit_cfg, num_steps=args.steps,
                              solver=args.solver, flow_shift=args.flow_shift,
                              sampler_seed=args.sampler_seed)
    vae_dec = TemporalVAEDecoder(vae_cfg)
    if args.checkpoint:
        from vdpp_tpu.utils.weights import load_params

        t5_params = load_params(os.path.join(args.checkpoint, "t5.npz"),
                                dtype=t5_cfg.dtype)
        dit_params = load_params(os.path.join(args.checkpoint, "dit.npz"),
                                 dtype=dit_cfg.dtype)
        vae_dec_params = load_params(os.path.join(args.checkpoint, "vae_decoder.npz"))
    else:
        t5_params = jax.jit(t5.init)(jax.random.key(args.seed))
        dit_params = jax.jit(wrapper.init)(jax.random.key(args.seed + 1))
        vae_dec_params = vae_dec.init(jax.random.key(args.seed + 2))
    jax.block_until_ready(dit_params)
    t_load = time.perf_counter() - t0
    LOGGER.info("models ready in %.1fs", t_load)

    # ---- text encode (then free the tower, reference:302-307 analogue) ----
    t0 = time.perf_counter()
    ctx = t5.apply(t5_params, jnp.asarray(ids))  # (1, M, D)
    ctx = jax.block_until_ready(ctx).astype(jnp.float32)
    if neg_ids is not None:
        neg_ctx = t5.apply(t5_params, jnp.asarray(neg_ids))
        neg_ctx = jax.block_until_ready(neg_ctx).astype(jnp.float32)
        ctx = (neg_ctx, ctx)  # tuple context -> negative-prompt CFG
    del t5_params
    guidance = make_guidance_ramp(args.guidance_scale, args.num_frames)
    t_encode = time.perf_counter() - t0
    LOGGER.info("text encoded in %.1fs (%d tokens)", t_encode, ids.shape[1])

    # ---- denoise: PP and/or SP ----
    t0 = time.perf_counter()
    sp = args.seq_parallel
    stages = args.num_stages
    keys = jax.random.split(jax.random.key(args.seed + 3), args.num_samples)
    noise = (
        jax.vmap(
            lambda k: jax.random.normal(
                k, (1, args.num_frames, lat_h, lat_w, dit_cfg.in_channels),
                jnp.float32,
            )
        )(keys)
        * wrapper.init_noise_sigma
    )
    # dpmpp2m threads its multistep state through the payload channels;
    # pack_initial/unpack_final are identities for euler/heun.
    noise = wrapper.pack_initial(noise)
    bundle = (dit_params, ctx, guidance)

    if sp > 1 and (stages or 1) > 1:
        mesh = make_stage_seq_mesh(stages, sp)
        pipe = StepPipeline(
            mesh,
            wrapper.pipeline_step_fn(seq_axis="seq", seq_shards=sp),
            PipelineConfig(args.steps, stages),
        )
        latents = jax.block_until_ready(pipe.run(bundle, noise))
        mode = f"pp{stages} x sp{sp}"
    elif sp > 1:
        runner = SequenceParallelRunner(make_seq_mesh(sp), wrapper)
        outs = [
            runner.run(dit_params, noise[i], ctx, guidance)
            for i in range(args.num_samples)
        ]
        latents = jax.block_until_ready(jnp.stack(outs))
        mode = f"sp{sp}"
    elif (stages or 1) > 1 or stages is None:
        mesh = make_pipeline_mesh(stages)
        stages = mesh.shape["stage"]
        pipe = StepPipeline(
            mesh, wrapper.pipeline_step_fn(), PipelineConfig(args.steps, stages)
        )
        latents = jax.block_until_ready(pipe.run(bundle, noise))
        mode = f"pp{stages}"
    else:
        latents = jax.block_until_ready(
            run_reference_single_device(
                wrapper.pipeline_step_fn(), bundle, noise, args.steps
            )
        )
        mode = "single"
    latents = wrapper.unpack_final(latents)
    t_diffusion = time.perf_counter() - t0
    del dit_params
    LOGGER.info("diffusion [%s]: %.1fs (%d samples)", mode, t_diffusion,
                args.num_samples)

    # ---- decode + save ----
    t0 = time.perf_counter()
    os.makedirs(args.output_dir, exist_ok=True)
    outputs = []
    for i in range(args.num_samples):
        lat = latents[i] / vae_cfg.scaling_factor
        video = vae_dec.decode_chunked(
            vae_dec_params, lat, chunk_frames=args.decode_chunk_frames
        )
        frames = frames_to_uint8(np.asarray(video[0]))
        name = build_output_name(
            "dit_text", num_frames=args.num_frames, steps=args.steps,
            stages=args.num_stages or 1, fps=args.fps, seed=args.seed + i,
            ext="mp4",
        )
        path = save_video_mp4(frames, os.path.join(args.output_dir, name), args.fps)
        save_video_gif(frames, os.path.splitext(path)[0] + ".gif", args.fps)
        outputs.append(path)
    t_decode = time.perf_counter() - t0

    total = time.perf_counter() - t_start
    LOGGER.info("=" * 60)
    LOGGER.info(
        "TIMING  load %.1fs | encode %.1fs | diffusion %.1fs | "
        "decode+save %.1fs | total %.1fs",
        t_load, t_encode, t_diffusion, t_decode, total,
    )
    for p in outputs:
        LOGGER.info("output: %s", p)
    LOGGER.info("=" * 60)
    return 0


if __name__ == "__main__":
    sys.exit(main())
