"""Video -> video refinement (SDEdit-style partial denoising) on the mesh.

Beyond the reference (which has no video-INPUT path at all): read a
video, VAE-encode every frame, re-noise the clean latents to the
schedule's ``sigma_start`` for the requested ``--strength``, and run only
the TAIL of the denoising schedule through the step pipeline — the
SDEdit construction (Meng et al. 2022): small strengths refine/restyle
while preserving structure, strength 1.0 is full generation from noise.

The truncated schedule is the bit-identical tail of the full one
(EulerKarrasSchedule.create(denoise_from=k)), so every pipeline
invariant (stage-count invariance, identity padding, payload packing for
dpmpp2m/deepcache) applies unchanged. Conditioning follows the SVD
image-to-video convention with the FIRST input frame as the
conditioning image (CLIP embedding + unscaled VAE latent).

Input format: YUV4MPEG2 (.y4m), the native writer's own lossless-leg
format (utils/video_io.read_y4m) — every app in this repo emits it.

Example (CPU mesh):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/restyle_video.py --input in.y4m --strength 0.4 \
        --random-weights --preset tiny --backend cpu --steps 8 --num-stages 2
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGGER = logging.getLogger("vdpp.restyle")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input video (.y4m)")
    p.add_argument("--strength", type=float, default=0.5,
                   help="fraction of the schedule to re-run, in (0, 1]: "
                        "the latents are re-noised to the sigma at "
                        "(1-strength) of the schedule and denoised from "
                        "there (SDEdit); 1.0 = full generation")
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--preset", default="svd_xt", choices=["svd_xt", "tiny"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--num-frames", type=int, default=None,
                   help="use only the first N input frames (default: all)")
    p.add_argument("--steps", type=int, default=25,
                   help="FULL schedule length the truncation slices")
    p.add_argument("--num-stages", type=int, default=None)
    p.add_argument("--guidance-scale", type=float, default=3.0)
    p.add_argument("--cfg-mode", default="sequential",
                   choices=["sequential", "batched"])
    p.add_argument("--solver", default="euler",
                   choices=["euler", "euler_a", "heun", "dpmpp2m"])
    p.add_argument("--sampler-seed", type=int, default=0)
    p.add_argument("--deepcache", type=int, default=0, metavar="N")
    p.add_argument("--deepcache-split", type=int, default=1)
    p.add_argument("--seq-parallel", type=int, default=1)
    p.add_argument("--frame-parallel", type=int, default=1)
    p.add_argument("--motion-bucket-id", type=int, default=127)
    p.add_argument("--noise-aug-strength", type=float, default=0.02)
    p.add_argument("--decode-chunk-frames", type=int, default=4)
    p.add_argument("--vae-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="VAE compute dtype (bfloat16 halves encode/decode "
                        "memory and roughly halves decode time; same flag "
                        "as generate_video.py)")
    p.add_argument("--fps", type=int, default=None,
                   help="output fps (default: the input's)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--log-level", default="INFO")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from vdpp_tpu.models.clip_encoder import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
        preprocess_image,
    )
    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_conditioning
    from vdpp_tpu.models.vae import TemporalVAEDecoder, VAEConfig, VAEEncoder
    from vdpp_tpu.parallel.mesh import make_pipeline_and_decode_meshes
    from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline
    from vdpp_tpu.utils.compile_cache import enable_persistent_cache
    from vdpp_tpu.utils.logging import setup_logging
    from vdpp_tpu.utils.video_io import (
        build_output_name,
        frames_to_uint8,
        read_y4m,
        save_video_gif,
        save_video_mp4,
    )

    setup_logging(args.log_level)
    enable_persistent_cache()
    t_start = time.perf_counter()

    if not args.checkpoint and not args.random_weights:
        LOGGER.error("provide --checkpoint or --random-weights")
        return 1
    if not 0.0 < args.strength <= 1.0:
        LOGGER.error("--strength must be in (0, 1], got %s", args.strength)
        return 1

    # ---- input video ----
    frames_u8, in_fps = read_y4m(args.input)
    if args.num_frames:
        frames_u8 = frames_u8[: args.num_frames]
    f, height, width = frames_u8.shape[:3]
    fps = args.fps or in_fps
    frames = frames_u8.astype(np.float32) / 127.5 - 1.0  # [-1, 1]

    tiny = args.preset == "tiny"
    vae_dtype = jnp.bfloat16 if args.vae_dtype == "bfloat16" else jnp.float32
    unet_cfg = SVDUNetConfig.tiny() if tiny else SVDUNetConfig.svd_xt()
    vae_cfg = VAEConfig.tiny(vae_dtype) if tiny else VAEConfig.svd(vae_dtype)
    clip_cfg = CLIPVisionConfig.tiny() if tiny else CLIPVisionConfig.vit_h_14()
    if tiny:
        import dataclasses

        clip_cfg = dataclasses.replace(
            clip_cfg, projection_dim=unet_cfg.cross_attention_dim
        )

    spatial_down = 2 ** (len(vae_cfg.block_out_channels) - 1)
    if height % spatial_down or width % spatial_down:
        LOGGER.error("input %dx%d not divisible by the VAE factor %d",
                     width, height, spatial_down)
        return 1
    lat_h, lat_w = height // spatial_down, width // spatial_down

    # SDEdit truncation: re-run the last (steps - k) steps.
    denoise_from = min(round((1.0 - args.strength) * args.steps),
                       args.steps - 1)

    sp, fp = args.seq_parallel, args.frame_parallel
    if sp > 1 and lat_w % unet_cfg.seq_min_divisor(sp) != 0:
        LOGGER.error("--seq-parallel %d: latent width %d must divide by %d",
                     sp, lat_w, unet_cfg.seq_min_divisor(sp))
        return 1
    if fp > 1 and f % fp != 0:
        LOGGER.error("--frame-parallel %d: %d input frames must divide by it",
                     fp, f)
        return 1
    mesh, _ = make_pipeline_and_decode_meshes(
        args.num_stages, 0, args.backend, seq=sp, frame=fp
    )
    stages = mesh.shape["stage"]

    # ---- models ----
    t0 = time.perf_counter()
    model = StableVideoUNet(
        unet_cfg, num_steps=args.steps, cfg_mode=args.cfg_mode,
        solver=args.solver, sampler_seed=args.sampler_seed,
        deepcache_interval=args.deepcache,
        deepcache_split=args.deepcache_split,
        denoise_from=denoise_from,
        pad_steps_to=stages if (args.steps - denoise_from) % stages else None,
    )
    run_steps = model.num_steps  # sliced (+ any identity padding)
    LOGGER.info(
        "restyle: %dx%d, %d frames, strength %.2f -> %d of %d steps "
        "(sigma_start %.3f) over %d stages",
        width, height, f, args.strength, run_steps, args.steps,
        model.sigma_start, stages,
    )
    clip_enc = CLIPVisionEncoder(clip_cfg)
    vae_enc = VAEEncoder(vae_cfg)
    vae_dec = TemporalVAEDecoder(vae_cfg)
    if args.checkpoint:
        from vdpp_tpu.utils.weights import load_params

        unet_params = load_params(
            os.path.join(args.checkpoint, "unet.npz"), dtype=unet_cfg.dtype
        )
        clip_params = load_params(os.path.join(args.checkpoint, "clip.npz"))
        vae_enc_params = load_params(
            os.path.join(args.checkpoint, "vae_encoder.npz")
        )
        vae_dec_params = load_params(
            os.path.join(args.checkpoint, "vae_decoder.npz")
        )
    else:
        unet_params = jax.jit(model.init)(jax.random.key(args.seed))
        clip_params = clip_enc.init(jax.random.key(args.seed + 1))
        vae_enc_params = vae_enc.init(jax.random.key(args.seed + 2))
        vae_dec_params = vae_dec.init(jax.random.key(args.seed + 3))
    jax.block_until_ready(unet_params)
    t_load = time.perf_counter() - t0
    LOGGER.info("models ready in %.1fs", t_load)

    # ---- encode: conditioning (frame 0) + every frame's clean latent ----
    t0 = time.perf_counter()
    first = frames[0]
    clip_px = preprocess_image(frames_u8[0], size=clip_cfg.image_size)
    clip_embeds = clip_enc.apply(clip_params, jnp.asarray(clip_px)[None])
    jax.block_until_ready(clip_embeds)
    del clip_params

    key = jax.random.key(args.seed + 4)
    noise_aug = args.noise_aug_strength * jax.random.normal(
        key, first.shape, jnp.float32
    )
    # Conditioning latent: SVD convention — mode(), NO scaling factor.
    cond_moments = vae_enc.apply(vae_enc_params, jnp.asarray(first)[None] + noise_aug)
    image_latent = vae_enc.mode(cond_moments)
    image_latents = jnp.repeat(image_latent[:, None], f, axis=1)

    # Clean DIFFUSION-space latents for every frame: mode() * scaling
    # (decode divides by the scaling factor, vae.py decode path).
    chunks = []
    step = max(args.decode_chunk_frames, 1)
    for i in range(0, f, step):
        m = vae_enc.apply(vae_enc_params, jnp.asarray(frames[i:i + step]))
        chunks.append(vae_enc.mode(m) * vae_cfg.scaling_factor)
    x0 = jnp.concatenate(chunks, axis=0)[None]  # (1, F, h, w, 4)
    jax.block_until_ready(x0)
    del vae_enc_params

    cond = make_conditioning(
        image_embeddings=clip_embeds,
        image_latents=image_latents,
        num_frames=f,
        fps=fps,
        motion_bucket_id=args.motion_bucket_id,
        noise_aug_strength=args.noise_aug_strength,
        guidance_scale=args.guidance_scale,
    )
    t_encode = time.perf_counter() - t0
    LOGGER.info("conditioning + %d frame latents encoded in %.1fs", f, t_encode)

    # ---- re-noise to sigma_start and denoise the schedule tail ----
    t0 = time.perf_counter()
    step_kwargs = {}
    if sp > 1:
        step_kwargs.update(seq_axis="seq", seq_shards=sp)
    if fp > 1:
        step_kwargs.update(frame_axis="frame", frame_shards=fp)
    pipe = StepPipeline(
        mesh, model.pipeline_step_fn(**step_kwargs),
        PipelineConfig(run_steps, stages),
    )
    noise = jax.random.normal(
        jax.random.key(args.seed), (1, 1, f, lat_h, lat_w, 4), jnp.float32
    )
    latent0 = x0[None] + model.sigma_start * noise  # (N=1, 1, F, h, w, 4)
    latents = jax.block_until_ready(
        pipe.run((unet_params, cond), model.pack_initial(latent0))
    )
    latents = model.unpack_final(latents)
    t_diffusion = time.perf_counter() - t0
    del unet_params
    LOGGER.info("diffusion: %.1fs (%d steps)", t_diffusion, run_steps)

    # ---- decode + save ----
    t0 = time.perf_counter()
    os.makedirs(args.output_dir, exist_ok=True)
    video = vae_dec.decode_chunked(
        vae_dec_params, latents[0] / vae_cfg.scaling_factor,
        chunk_frames=args.decode_chunk_frames,
    )
    out_frames = frames_to_uint8(np.asarray(video[0]))
    name = build_output_name(
        "restyle", num_frames=f, steps=run_steps, stages=stages,
        fps=fps, seed=args.seed, ext="mp4",
    )
    path = save_video_mp4(out_frames, os.path.join(args.output_dir, name), fps)
    save_video_gif(out_frames, os.path.splitext(path)[0] + ".gif", fps)
    t_decode = time.perf_counter() - t0

    total = time.perf_counter() - t_start
    LOGGER.info("=" * 60)
    LOGGER.info("TIMING  load %.1fs | encode %.1fs | diffusion %.1fs | "
                "decode+save %.1fs | total %.1fs",
                t_load, t_encode, t_diffusion, t_decode, total)
    LOGGER.info("output: %s", path)
    LOGGER.info("=" * 60)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
