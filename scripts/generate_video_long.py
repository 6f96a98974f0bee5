"""Long image -> video generation: autoregressive segment chaining.

BEYOND the reference (its demo generates at most one trained frame
window per run, reference: scripts/generate_video_demo.py): produce
``F + (K-1) * (F-1)`` frames by generating K segments, re-conditioning
each continuation on the PREVIOUS segment's last decoded frame — the
standard SVD long-video recipe (the conditioning image is replayed as a
continuation's first frame, so continuations contribute frames [1:]).

Every segment runs the same step-pipelined denoise as the flagship app
(one jitted SPMD program, compiled once and reused across segments) and
composes with the solver/deepcache throughput levers:

    python scripts/generate_video_long.py --random-weights --preset tiny \
        --backend cpu --num-frames 4 --steps 8 --num-stages 2 --segments 3
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_SCRIPTS))
sys.path.insert(0, _SCRIPTS)

LOGGER = logging.getLogger("vdpp.generate_long")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", default=None,
                   help="input image path; synthetic gradient if omitted")
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--preset", default="svd_xt", choices=["svd_xt", "tiny"])
    p.add_argument("--checkpoint", default=None,
                   help="converted weights dir (unet.npz/vae_*.npz/clip.npz)")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--num-frames", type=int, default=14,
                   help="frames PER SEGMENT (the model's trained window)")
    p.add_argument("--segments", type=int, default=2,
                   help="segments to chain; total frames = "
                        "F + (segments-1)*(F-1)")
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--num-stages", type=int, default=None)
    p.add_argument("--guidance-scale", type=float, default=3.0)
    p.add_argument("--cfg-mode", default="sequential",
                   choices=["sequential", "batched"])
    p.add_argument("--solver", default="euler",
                   choices=["euler", "euler_a", "heun", "dpmpp2m"])
    p.add_argument("--deepcache", type=int, default=0, metavar="N")
    p.add_argument("--deepcache-split", type=int, default=1)
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--motion-bucket-id", type=int, default=127)
    p.add_argument("--noise-aug-strength", type=float, default=0.02)
    p.add_argument("--decode-chunk-frames", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--sampler-seed", type=int, default=0,
                   help="euler_a only: seed of the per-step injected "
                        "noise (construction-time; vary per run)")
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--log-level", default="INFO")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.segments < 1:
        raise SystemExit("--segments must be >= 1")
    if not args.checkpoint and not args.random_weights:
        raise SystemExit("pass --checkpoint DIR or --random-weights")

    from vdpp_tpu.utils.logging import setup_logging

    setup_logging(args.log_level)
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np
    from generate_video import load_and_preprocess_image

    from vdpp_tpu.models.clip_encoder import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
        preprocess_image,
    )
    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_conditioning
    from vdpp_tpu.models.vae import TemporalVAEDecoder, VAEConfig, VAEEncoder
    from vdpp_tpu.parallel.mesh import make_pipeline_mesh
    from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline
    from vdpp_tpu.utils.video_io import (
        build_output_name,
        frames_to_uint8,
        save_video_gif,
        save_video_mp4,
    )

    t_start = time.perf_counter()
    tiny = args.preset == "tiny"
    unet_cfg = SVDUNetConfig.tiny() if tiny else SVDUNetConfig.svd_xt()
    vae_cfg = VAEConfig.tiny() if tiny else VAEConfig.svd()
    clip_cfg = CLIPVisionConfig.tiny() if tiny else CLIPVisionConfig.vit_h_14()
    if tiny:
        import dataclasses

        # CLIP projection must match the UNet's cross-attention width
        # (same adjustment as the flagship generate_video.py).
        clip_cfg = dataclasses.replace(
            clip_cfg, projection_dim=unet_cfg.cross_attention_dim
        )
        args.width, args.height = max(args.width, 64), max(args.height, 64)
    spatial_down = 2 ** (len(vae_cfg.block_out_channels) - 1)
    lat_h, lat_w = args.height // spatial_down, args.width // spatial_down

    mesh = make_pipeline_mesh(args.num_stages, backend=args.backend)
    stages = mesh.shape["stage"]

    model = StableVideoUNet(
        unet_cfg, num_steps=args.steps, cfg_mode=args.cfg_mode,
        solver=args.solver, sampler_seed=args.sampler_seed,
        deepcache_interval=args.deepcache,
        deepcache_split=args.deepcache_split,
    )
    clip_enc = CLIPVisionEncoder(clip_cfg)
    vae_enc = VAEEncoder(vae_cfg)
    vae_dec = TemporalVAEDecoder(vae_cfg)
    t0 = time.perf_counter()
    if args.checkpoint:
        from vdpp_tpu.utils.weights import load_params

        unet_params = load_params(
            os.path.join(args.checkpoint, "unet.npz"), dtype=unet_cfg.dtype
        )
        clip_params = load_params(os.path.join(args.checkpoint, "clip.npz"))
        vae_enc_params = load_params(
            os.path.join(args.checkpoint, "vae_encoder.npz"))
        vae_dec_params = load_params(
            os.path.join(args.checkpoint, "vae_decoder.npz"))
    else:
        unet_params = jax.jit(model.init)(jax.random.key(args.seed))
        clip_params = clip_enc.init(jax.random.key(args.seed + 1))
        vae_enc_params = vae_enc.init(jax.random.key(args.seed + 2))
        vae_dec_params = vae_dec.init(jax.random.key(args.seed + 3))
    jax.block_until_ready(unet_params)
    LOGGER.info("models ready in %.1fs", time.perf_counter() - t0)

    pipe = StepPipeline(
        mesh, model.pipeline_step_fn(), PipelineConfig(args.steps, stages)
    )

    def encode_conditioning(image_np, seg: int):
        """CLIP embed + noise-augmented VAE encode of one [-1,1] frame —
        the flagship's conditioning recipe (reference:
        generate_video_demo.py:92-151), reusable per segment."""
        clip_px = preprocess_image(
            ((image_np + 1.0) * 127.5).astype(np.uint8), size=clip_cfg.image_size
        )
        clip_embeds = clip_enc.apply(clip_params, jnp.asarray(clip_px)[None])
        key = jax.random.key(args.seed + 100 + seg)
        noise_aug = args.noise_aug_strength * jax.random.normal(
            key, image_np.shape, jnp.float32
        )
        moments = vae_enc.apply(
            vae_enc_params, jnp.asarray(image_np)[None] + noise_aug
        )
        image_latent = vae_enc.mode(moments)
        image_latents = jnp.repeat(image_latent[:, None], args.num_frames, axis=1)
        return make_conditioning(
            image_embeddings=clip_embeds,
            image_latents=image_latents,
            num_frames=args.num_frames,
            fps=args.fps,
            motion_bucket_id=args.motion_bucket_id,
            noise_aug_strength=args.noise_aug_strength,
            guidance_scale=args.guidance_scale,
        )

    image = load_and_preprocess_image(args.image, args.width, args.height)
    pieces: list[np.ndarray] = []
    t_diff = t_dec = 0.0
    for seg in range(args.segments):
        cond = encode_conditioning(image, seg)
        noise = model.pack_initial(
            jax.random.normal(
                jax.random.key(args.seed + seg),
                (1, 1, args.num_frames, lat_h, lat_w, 4), jnp.float32,
            )
            * model.init_noise_sigma
        )
        t0 = time.perf_counter()
        latents = jax.block_until_ready(pipe.run((unet_params, cond), noise))
        t_diff += time.perf_counter() - t0
        lat = model.unpack_final(latents)[0]
        t0 = time.perf_counter()
        video = vae_dec.decode_chunked(
            vae_dec_params, lat / vae_cfg.scaling_factor,
            chunk_frames=args.decode_chunk_frames,
        )  # (1, F, H, W, 3) in [-1, 1]
        vid = np.asarray(jax.block_until_ready(video[0]), np.float32)
        t_dec += time.perf_counter() - t0
        pieces.append(vid if seg == 0 else vid[1:])
        # Next segment continues from the last decoded frame.
        image = np.clip(vid[-1], -1.0, 1.0)
        LOGGER.info("segment %d/%d done (%d new frames)", seg + 1,
                    args.segments, pieces[-1].shape[0])

    stitched = np.concatenate(pieces, axis=0)
    total_frames = args.num_frames + (args.segments - 1) * (args.num_frames - 1)
    assert stitched.shape[0] == total_frames, stitched.shape

    os.makedirs(args.output_dir, exist_ok=True)
    frames = frames_to_uint8(stitched)
    name = build_output_name(
        f"svd_long{args.segments}x", num_frames=total_frames, steps=args.steps,
        stages=stages, fps=args.fps, seed=args.seed, ext="mp4",
    )
    path = save_video_mp4(frames, os.path.join(args.output_dir, name), args.fps)
    save_video_gif(frames, os.path.splitext(path)[0] + ".gif", args.fps)

    LOGGER.info("=" * 60)
    LOGGER.info(
        "TIMING  diffusion %.1fs | decode %.1fs | total %.1fs  "
        "(%d segments -> %d frames)",
        t_diff, t_dec, time.perf_counter() - t_start,
        args.segments, total_frames,
    )
    LOGGER.info("output: %s", path)
    LOGGER.info("=" * 60)
    return 0


if __name__ == "__main__":
    sys.exit(main())
