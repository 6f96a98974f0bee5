"""Serving mode: HTTP video-generation endpoint on a streaming pipeline.

The reference is a batch CLI system; this framework's streaming executor
(vdpp_tpu.parallel.pipeline.PipelineStream) was designed for the serving
shape — requests arriving over time keep the stage pipeline FILLED, so
concurrent requests share one pipeline: a request submitted while another
is in transit completes one tick after it, not a full pipeline-depth
later. VAE decode happens outside the stream, overlapping the next
request's denoising; with ``--decode-devices N`` decode additionally runs
on its own reserved device subset (task decoupling), so pipeline ticks
never queue behind decode work on the stage devices.

    POST /generate  {"seed": 42, "num_frames": 4, "guidance_scale": 3.0,
                     "prompt": "...", "negative_prompt": "...",
                     "format": "y4m"|"gif"}
        -> video bytes (y4m/gif via the native C++ packer)
    GET  /healthz   -> {"status": "ok", ...} (503 {"status": "draining"}
                       once a shutdown signal has been received)
    GET  /metrics   -> request counters + rolling latency distribution

SIGTERM/SIGINT drain instead of kill (rolling-restart contract):
/healthz flips to 503 so load balancers stop routing, new /generate
requests are refused with 503, in-flight requests run to completion,
then the process exits 0 (tests/test_serve.py::
test_sigterm_drains_and_exits_zero).

``--model svd`` (default) serves the image-conditioned SVD UNet;
``--model dit3d`` serves the T5-text-conditioned joint-3D DiT — the
"prompt" field selects the conditioning (requests with the same
(prompt, frames, guidance) share one filled pipeline).

Example:
    python -m vdpp_tpu.modes.serve --preset tiny --backend cpu \
        --num-stages 4 --steps 8 --port 8787
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

LOGGER = logging.getLogger("vdpp.serve")

# Per-request frame ceiling: each distinct num_frames traces its own
# stream (LRU-capped), so an unbounded value would both OOM a trace and
# let one client churn the stream cache. 64 covers svd-xt (25) and every
# preset with headroom.
MAX_FRAMES_PER_REQUEST = 64


class BadRequest(ValueError):
    """Client-input validation failure -> HTTP 400.

    Only THIS type maps to 400: a bare ValueError raised deep inside the
    generate path (e.g. a JAX shape check) is an internal error and must
    surface as 500 with a server-side traceback, not be misreported as a
    bad request."""


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--model", default="svd", choices=["svd", "dit3d"])
    p.add_argument("--preset", default="tiny", choices=["svd_xt", "full", "tiny"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num-stages", type=int, default=None)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--num-frames", type=int, default=4)
    p.add_argument("--latent-hw", type=int, nargs=2, default=[16, 16],
                   metavar=("H", "W"))
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--solver", default="euler",
                   choices=["euler", "euler_a", "heun", "dpmpp2m", "flowmatch"],
                   help="ODE solver (see production --solver); dpmpp2m "
                        "gives 2nd-order accuracy at 1 eval/step — fewer "
                        "--steps for the same quality per request; "
                        "flowmatch = rectified-flow parameterization "
                        "(--model dit3d only)")
    p.add_argument("--deepcache", type=int, default=0, metavar="N",
                   help="SVD preset only: DeepCache-style cached inference "
                        "— full UNet every N steps (0 = off; changes "
                        "outputs, a speed/quality capacity lever)")
    p.add_argument("--deepcache-split", type=int, default=1,
                   help="shallow levels the cache steps still compute")
    p.add_argument("--seq-parallel", type=int, default=1,
                   help="token/W sharding width per stage — a "
                        "(stage, seq) mesh (DiT: token shards; SVD: "
                        "halo-exchange W shards)")
    p.add_argument("--frame-parallel", type=int, default=1,
                   help="frame sharding width per stage (SVD models): "
                        "a (stage[, seq], frame) mesh; --num-frames "
                        "must divide by it")
    p.add_argument("--decode-devices", type=int, default=0,
                   help="reserve this many devices (after the stage "
                        "devices) for VAE decode, so pipeline ticks "
                        "never queue behind decode work")
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sampler-seed", type=int, default=0,
                   help="euler_a only: seed of the per-step injected "
                        "noise (construction-time; vary per run)")
    p.add_argument("--log-level", default="INFO")
    return p


class _Engine:
    """Owns the model + pipeline; one request at a time."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp

        from vdpp_tpu.models.svd_unet import SVDUNetConfig
        from vdpp_tpu.models.svd_wrapper import StableVideoUNet
        from vdpp_tpu.models.vae import TemporalVAEDecoder, VAEConfig
        from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline

        self.jax = jax
        self.jnp = jnp
        self.args = args
        # Flipped by the SIGTERM/SIGINT drain handler: /healthz turns 503
        # so load balancers stop routing here, new /generate requests are
        # refused, in-flight ones finish (rolling-restart contract).
        self.draining = False
        tiny = args.preset == "tiny"
        self.is_dit = args.model == "dit3d"
        # Pure-argument validation BEFORE any model construction or
        # checkpoint load (minutes of work on a real chip).
        fp_early = getattr(args, "frame_parallel", 1)
        if fp_early > 1 and self.is_dit:
            raise SystemExit(
                "--frame-parallel serves the SVD family only (the DiT "
                "token axis already covers frames via --seq-parallel)"
            )
        if args.solver == "flowmatch" and not self.is_dit:
            raise SystemExit(
                "--solver flowmatch serves the DiT family only: SVD's "
                "published weights are v-prediction EDM, a different "
                "parameterization from rectified flow (--model dit3d)"
            )
        if fp_early > 1 and args.num_frames % fp_early != 0:
            raise SystemExit(
                f"--frame-parallel {fp_early}: --num-frames "
                f"{args.num_frames} must divide by it"
            )
        self.vae_cfg = VAEConfig.tiny() if tiny else VAEConfig.svd()

        if self.is_dit:
            if args.deepcache:
                raise SystemExit(
                    "--deepcache is implemented for the SVD UNet family "
                    "only (the DiT has no encoder-decoder skip structure "
                    "to cache across)"
                )
            import dataclasses

            from vdpp_tpu.models.dit import DiTVideoConfig, DiTVideoWrapper
            from vdpp_tpu.models.t5_encoder import T5EncoderConfig, T5TextEncoder

            self.t5_cfg = T5EncoderConfig.tiny() if tiny else T5EncoderConfig.xxl()
            dit_cfg = dataclasses.replace(
                DiTVideoConfig.joint3d_tiny() if tiny
                else DiTVideoConfig.joint3d_xl(),
                cross_attention_dim=self.t5_cfg.d_model,
            )
            self.model = DiTVideoWrapper(dit_cfg, num_steps=args.steps,
                                         solver=args.solver,
                                         sampler_seed=args.sampler_seed)
            self.t5 = T5TextEncoder(self.t5_cfg)
            self.t5_params = jax.jit(self.t5.init)(jax.random.key(args.seed + 3))
        else:
            self.unet_cfg = (
                SVDUNetConfig.tiny() if tiny else SVDUNetConfig.svd_xt()
            )
            self.model = StableVideoUNet(self.unet_cfg, num_steps=args.steps,
                                         solver=args.solver,
                                         sampler_seed=args.sampler_seed,
                                         deepcache_interval=args.deepcache,
                                         deepcache_split=args.deepcache_split)
        self.vae_dec = TemporalVAEDecoder(self.vae_cfg)
        if args.checkpoint:
            from vdpp_tpu.utils.weights import load_params

            name = "dit.npz" if self.is_dit else "unet.npz"
            self.params = load_params(os.path.join(args.checkpoint, name))
            self.vae_params = load_params(
                os.path.join(args.checkpoint, "vae_decoder.npz")
            )
        else:
            self.params = jax.jit(self.model.init)(jax.random.key(args.seed))
            self.vae_params = self.vae_dec.init(jax.random.key(args.seed + 1))

        # Task decoupling: decode on devices the pipeline never uses, so a
        # tick dispatched right after a decode does not queue behind it
        # (the stream thread keeps ticking while decode runs).
        # Chunk-parallel decode shards across the reserved subset.
        from vdpp_tpu.parallel.mesh import make_pipeline_and_decode_meshes

        sp = getattr(args, "seq_parallel", 1)
        fp = getattr(args, "frame_parallel", 1)
        self.mesh, self.decode_mesh = make_pipeline_and_decode_meshes(
            args.num_stages, args.decode_devices, args.backend, seq=sp,
            frame=fp,
        )
        self.stages = self.mesh.shape["stage"]
        step_kwargs = {}
        if sp > 1:
            step_kwargs.update(seq_axis="seq", seq_shards=sp)
        if fp > 1:
            step_kwargs.update(frame_axis="frame", frame_shards=fp)
        self.pipe = StepPipeline(
            self.mesh,
            self.model.pipeline_step_fn(**step_kwargs),
            PipelineConfig(args.steps, self.stages),
        )
        self.lock = threading.Lock()  # stream creation + counters
        self.requests_served = 0
        # LRU-bounded caches: every distinct conditioning key creates a
        # PipelineStream (driver thread + S donated device buffers) and
        # every distinct prompt a T5 context — unbounded growth from
        # client-controlled inputs would be a trivial resource exhaustion
        # on a long-lived endpoint. Oldest-used entries are evicted (and
        # streams closed) past the caps.
        self.max_streams = int(os.environ.get("VDPP_SERVE_MAX_STREAMS", "4"))
        self.max_ctx_cache = int(os.environ.get("VDPP_SERVE_MAX_PROMPTS", "32"))
        from collections import OrderedDict

        self._streams: OrderedDict = OrderedDict()  # key -> PipelineStream
        self._ctx_cache: OrderedDict = OrderedDict()  # prompt -> T5 context
        # Rolling request-latency window for /metrics (bounded).
        from collections import deque

        self._latencies: deque = deque(maxlen=512)
        LOGGER.info(
            "engine ready: %s, %d stages, %d steps",
            args.model, self.stages, args.steps,
        )

    def _text_context(self, prompt: str, negative: str | None = None):
        """T5-encode a prompt (hash tokenizer without a checkpoint vocab);
        cached per (prompt, negative). With a negative prompt the result
        is a ``(neg_ctx, pos_ctx)`` tuple (the DiT wrapper's
        negative-prompt CFG form); both id lists are EOS-padded to a
        common length so the cfg-parallel axis can select per device."""
        cache_key = (prompt, negative)
        with self.lock:
            if cache_key in self._ctx_cache:
                self._ctx_cache.move_to_end(cache_key)
                return self._ctx_cache[cache_key]
        from vdpp_tpu.models.t5_encoder import hash_tokenize

        jnp = self.jnp
        pos = hash_tokenize(prompt, self.t5_cfg.vocab_size, 64)
        if negative is None:
            ctx = self.jax.block_until_ready(
                self.t5.apply(self.t5_params, jnp.asarray([pos], jnp.int32))
            ).astype(jnp.float32)
        else:
            neg = hash_tokenize(negative, self.t5_cfg.vocab_size, 64)
            eos = self.t5_cfg.vocab_size - 1
            want = max(len(pos), len(neg))
            pos = pos + [eos] * (want - len(pos))
            neg = neg + [eos] * (want - len(neg))
            pos_ctx = self.t5.apply(
                self.t5_params, jnp.asarray([pos], jnp.int32)
            ).astype(jnp.float32)
            neg_ctx = self.t5.apply(
                self.t5_params, jnp.asarray([neg], jnp.int32)
            ).astype(jnp.float32)
            ctx = (
                self.jax.block_until_ready(neg_ctx),
                self.jax.block_until_ready(pos_ctx),
            )
        with self.lock:
            self._ctx_cache[cache_key] = ctx
            while len(self._ctx_cache) > self.max_ctx_cache:
                self._ctx_cache.popitem(last=False)
        return ctx

    def _get_stream(self, num_frames: int, guidance: float | None,
                    prompt: str | None, negative: str | None = None):
        """One PipelineStream per conditioning config; requests with the
        same config share its filled pipeline."""
        jax, jnp = self.jax, self.jnp
        args = self.args
        h, w = args.latent_hw
        key = (
            num_frames, guidance,
            prompt if self.is_dit else None,
            negative if self.is_dit else None,
        )
        with self.lock:
            if key in self._streams:
                cached = self._streams[key]
                if cached.unusable:
                    # a poisoned/closed stream must not be served again —
                    # evict and rebuild below
                    del self._streams[key]
                else:
                    self._streams.move_to_end(key)
                    return cached
        if self.is_dit:
            from vdpp_tpu.models.svd_wrapper import make_guidance_ramp

            ctx = self._text_context(prompt or "", negative)
            bundle = (self.params, ctx, make_guidance_ramp(guidance, num_frames))
        else:
            from vdpp_tpu.models.svd_wrapper import make_dummy_conditioning

            cond = make_dummy_conditioning(
                jax.random.key(args.seed + 2), 1, num_frames, h, w,
                cross_dim=self.unet_cfg.cross_attention_dim,
                guidance_scale=guidance,
            )
            bundle = (self.params, cond)
        # The stream's traced payload shape includes any cross-step state
        # packed along channels (dpmpp2m: [x ‖ old x0_hat] = 8; deepcache:
        # [x ‖ cache lanes]).
        c = (4 * self.model.latent_channel_multiplier
             + getattr(self.model, "payload_extra_channels", 0))
        stream = self.pipe.stream(bundle, (1, num_frames, h, w, c), jnp.float32)
        evicted = []
        with self.lock:
            winner = self._streams.setdefault(key, stream)
            self._streams.move_to_end(key)
            while len(self._streams) > self.max_streams:
                _, old = self._streams.popitem(last=False)
                evicted.append(old)
        if winner is not stream:  # lost a concurrent creation race
            stream.close()
        for old in evicted:
            # Close off-thread: close() drains the evicted stream's
            # in-flight work, which must not stall this request.
            threading.Thread(target=old.close, daemon=True).start()
        return winner

    def generate(self, seed: int, num_frames: int, guidance: float | None,
                 prompt: str | None = None, negative: str | None = None):
        if negative is not None and not self.is_dit:
            raise BadRequest(
                "negative_prompt conditions the DiT text family only "
                "(the SVD preset is image-conditioned)"
            )
        if negative is not None and (guidance is None or guidance <= 1.0):
            # make_guidance_ramp disables CFG at <=1.0 — the negative
            # context would be T5-encoded and then silently ignored, so
            # reject the request instead of serving a misleading video.
            raise BadRequest(
                "negative_prompt needs CFG: set guidance_scale > 1.0 "
                f"(got {guidance})"
            )
        jax = self.jax
        args = self.args
        h, w = args.latent_hw
        fp = getattr(args, "frame_parallel", 1)
        if fp > 1 and num_frames % fp != 0:
            # reject BEFORE tracing: a trace-time failure inside the
            # stream driver would poison a stream slot per bad value
            raise BadRequest(
                f"num_frames {num_frames} must divide by --frame-parallel "
                f"{fp}"
            )
        stream = self._get_stream(num_frames, guidance, prompt, negative)
        noise = self.model.pack_initial(
            jax.random.normal(jax.random.key(seed), (1, num_frames, h, w, 4))
            * self.model.init_noise_sigma
        )
        t0 = time.perf_counter()
        # Denoise through the SHARED streaming pipeline; decode outside it
        # so the next request's denoising overlaps this one's decode.
        # The stream can be LRU-evicted (and closed) between lookup and
        # submit under heavy key churn — re-acquire and retry.
        for attempt in range(3):
            try:
                latents = stream.submit(noise).result(timeout=1800)
                break
            except RuntimeError:
                if attempt == 2:
                    raise
                stream = self._get_stream(num_frames, guidance, prompt,
                                          negative)
        latents = self.model.unpack_final(latents)
        scaled = latents / self.vae_cfg.scaling_factor
        if self.decode_mesh is not None:
            video = self.vae_dec.decode_data_parallel(
                self.vae_params, scaled, self.decode_mesh
            )
        else:
            video = self.vae_dec.decode_chunked(self.vae_params, scaled)
        video = jax.block_until_ready(video)
        elapsed = time.perf_counter() - t0
        with self.lock:
            self.requests_served += 1
            self._latencies.append(elapsed)
        return video[0], elapsed  # (F, H, W, 3)

    def metrics(self) -> dict:
        """Operational counters + latency distribution over a rolling
        512-request window (the reference has no serving surface at all;
        this is the observability contract of a long-lived endpoint)."""
        with self.lock:
            lats = sorted(self._latencies)
            n_streams = len(self._streams)
            served = self.requests_served

        def pct(p: float) -> float:
            if not lats:
                return 0.0
            return lats[min(int(p * (len(lats) - 1)), len(lats) - 1)]

        return {
            "requests_served": served,
            "active_streams": n_streams,
            "window": len(lats),
            "latency_s": {
                "mean": sum(lats) / len(lats) if lats else 0.0,
                "p50": pct(0.50),
                "p95": pct(0.95),
                "max": lats[-1] if lats else 0.0,
            },
        }


def _make_handler(engine: _Engine, fps: int):
    import numpy as np

    from vdpp_tpu.utils.native import write_y4m
    from vdpp_tpu.utils.video_io import frames_to_uint8

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            LOGGER.info("%s " + fmt, self.client_address[0], *a)

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if engine.draining:
                    self._json(503, {"status": "draining"})
                    return
                self._json(200, {
                    "status": "ok",
                    "stages": engine.stages,
                    "steps": engine.args.steps,
                    "decode_devices": engine.args.decode_devices,
                    "requests_served": engine.requests_served,
                })
            elif self.path == "/metrics":
                self._json(200, engine.metrics())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path"})
                return
            if engine.draining:
                self._json(503, {"error": "server is draining"})
                return
            try:
                try:
                    # parameter decode/validation: failures here are the
                    # client's — anything after is ours
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    seed = int(req.get("seed", 0))
                    frames = int(req.get("num_frames", engine.args.num_frames))
                    if not 1 <= frames <= MAX_FRAMES_PER_REQUEST:
                        raise BadRequest(
                            f"num_frames {frames} out of range "
                            f"[1, {MAX_FRAMES_PER_REQUEST}]"
                        )
                    guidance = req.get("guidance_scale",
                                       engine.args.guidance_scale)
                    if guidance is not None:
                        guidance = float(guidance)
                    prompt = req.get("prompt")
                    negative = req.get("negative_prompt")
                    fmt = req.get("format", "gif")
                    if fmt not in ("gif", "y4m"):
                        raise BadRequest(f"format {fmt!r}: use 'gif' or 'y4m'")
                except (ValueError, TypeError, json.JSONDecodeError) as e:
                    raise BadRequest(str(e)) from e
                video, elapsed = engine.generate(seed, frames, guidance,
                                                 prompt, negative)
                frames_u8 = frames_to_uint8(np.asarray(video))
                if fmt == "y4m":
                    import tempfile

                    with tempfile.NamedTemporaryFile(suffix=".y4m") as f:
                        write_y4m(f.name, frames_u8, fps=fps)
                        data = open(f.name, "rb").read()
                    ctype = "video/x-yuv4mpeg"
                else:
                    from vdpp_tpu.utils.native import write_gif_native

                    data = None
                    import tempfile

                    with tempfile.NamedTemporaryFile(suffix=".gif") as f:
                        if write_gif_native(f.name, frames_u8, fps=fps):
                            data = open(f.name, "rb").read()
                    if data is None:  # no native toolchain
                        import imageio.v3 as iio

                        buf = io.BytesIO()
                        iio.imwrite(buf, frames_u8, extension=".gif",
                                    duration=int(1000 / fps), loop=0)
                        data = buf.getvalue()
                    ctype = "image/gif"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.send_header("X-Generation-Seconds", f"{elapsed:.3f}")
                self.end_headers()
                self.wfile.write(data)
            except BadRequest as e:  # bad request parameters only
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # internal errors -> 500 + traceback
                LOGGER.exception("generate failed")
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class _DrainingServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that DRAINS on shutdown: request threads are
    non-daemon and ``server_close()`` joins them, so a SIGTERM rolling
    restart never kills a half-generated video (the stock class abandons
    in-flight threads at interpreter exit)."""

    daemon_threads = False
    block_on_close = True


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vdpp_tpu.utils.logging import setup_logging

    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    setup_logging(args.log_level)
    enable_persistent_cache()
    engine = _Engine(args)
    # Warm the compile so the first request isn't a multi-minute outlier.
    engine.generate(0, args.num_frames, args.guidance_scale)
    LOGGER.info("warmed; serving on http://%s:%d", args.host, args.port)

    server = _DrainingServer(
        (args.host, args.port), _make_handler(engine, args.fps)
    )

    def _drain(signum, frame):
        # Handler context: only set flags and hand off — shutdown() must
        # run on another thread (it joins serve_forever's loop).
        engine.draining = True
        LOGGER.info(
            "signal %d: draining — healthz 503, new requests refused, "
            "in-flight requests finishing", signum,
        )
        threading.Thread(target=server.shutdown, daemon=True).start()

    import signal

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        LOGGER.info("shutting down")
    # Joins in-flight handler threads (block_on_close + non-daemon).
    server.server_close()
    LOGGER.info("drained; exiting")
    return 0


if __name__ == "__main__":
    sys.exit(main())
