"""One-step blind restoration pipeline (the InstaRevive product).

Parity target: ``test_scripts/inference.py:39-166`` (``process()``):
SwinIR clean -> VAE encode (mode) x scale as init noise -> single DiT
denoise at t=400 -> VAE decode -> color fix, with a tiled mode that
overlap-averages in latent space and again in pixel space.

TPU design (vs the reference's Python tile loops):
  * the whole pipeline — including BOTH tiled passes — is one jitted
    program; tiles are processed by a ``lax.scan`` over a static offset
    grid with ``dynamic_slice``/``dynamic_update_slice`` accumulation, so
    everything stays on-device (no host round-trips per tile);
  * color-fix runs on-device per tile exactly like the reference
    (wavelet/adain vs the SwinIR-cleaned pixels);
  * compiled once per (H, W) bucket; callers pad to x64 first
    (utils/image_io.auto_resize + pad, mirroring the CLI).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from instarevive_tpu.diffusion.one_step import eps_to_x0
from instarevive_tpu.diffusion.schedules import DiffusionSchedule, make_schedule
from instarevive_tpu.models.pixart import PixArt
from instarevive_tpu.models.swinir import SwinIR
from instarevive_tpu.models.vae import AutoencoderKL
from instarevive_tpu.ops.color import adain_color_fix, wavelet_color_fix

VAE_SCALE = 0.18215  # test_scripts/inference.py:102,109


def sliding_offsets(length: int, tile: int, stride: int) -> np.ndarray:
    """Window offsets incl. a final end-aligned one (_sliding_windows,
    test_scripts/inference.py:39-52)."""
    offs = list(range(0, length - tile + 1, stride))
    if not offs or offs[-1] + tile < length:
        offs.append(length - tile)
    return np.asarray(offs, dtype=np.int32)


def tile_grid(h: int, w: int, tile: int, stride: int) -> np.ndarray:
    hs = sliding_offsets(h, tile, stride)
    ws = sliding_offsets(w, tile, stride)
    return np.stack(np.meshgrid(hs, ws, indexing="ij"), axis=-1).reshape(-1, 2)


def auto_tile_geometry(
    h: int,
    w: int,
    *,
    overlap: int = 64,
    candidates: Tuple[int, ...] = (512, 576, 640),
    latent_factor: int = 8,
) -> Tuple[int, int]:
    """Pick (tile_size, tile_stride) minimizing total tile work for an
    (h, w) padded image.

    The reference hardcodes 512/448 (test_scripts/inference.py:182-183),
    which covers 1024x1024 with 9 tiles = 2.25x overlap work; 576/512
    covers it in 4 tiles (1.27x) and measured +27% end-to-end on v5e
    (BENCH.md round 4: 3.01 -> 3.82 MP/s). Candidates keep the reference's
    64 px blend overlap; cost = n_tiles * tile^2, since per-tile DiT+decode
    cost tracks tile area at these sizes. The grid is computed in latent
    units exactly as ``process_tiled`` builds it, so end-aligned final
    tiles are costed correctly.
    """
    f = latent_factor
    best = None
    for tile in candidates:
        if tile > min(h, w):
            continue
        stride = tile - overlap
        n = len(sliding_offsets(h // f, tile // f, stride // f)) * len(
            sliding_offsets(w // f, tile // f, stride // f)
        )
        cost = n * tile * tile
        if best is None or cost < best[0]:
            best = (cost, tile, stride)
    if best is None:  # image smaller than every candidate: one full tile
        tile = max(64, (min(h, w) // 64) * 64)
        return tile, max(64, tile - overlap)
    return best[1], best[2]


def _packed_decode() -> bool:
    """IR_PACKED_DECODE=1: decode a batch as ONE N=1 grouped-conv program
    (ops/packed_vae.py) instead of the per-sample lax.map; read at trace
    time (opt-in until TPU-measured faster than the map)."""
    import os

    return os.environ.get("IR_PACKED_DECODE", "0") == "1"


def _batched_conv_stages() -> bool:
    """IR_BATCHED_CONV_STAGES=1 runs clean/encode/decode batched instead of
    the per-sample lax.map workaround (round-1 N>1 conv-layout storm);
    toggle for re-benching after layout-relevant changes (read at trace
    time)."""
    import os

    return os.environ.get("IR_BATCHED_CONV_STAGES", "0") == "1"


@dataclass
class RestorationPipeline:
    """Bundles the three models + schedule and exposes jitted process fns."""

    swinir: SwinIR = field(default_factory=SwinIR)
    vae: AutoencoderKL = field(default_factory=AutoencoderKL)
    dit: PixArt = field(default_factory=lambda: PixArt(pred_sigma=True))
    sched: DiffusionSchedule = field(default_factory=lambda: make_schedule("linear", 1000))
    maxt: int = 400  # fixed inference timestep (inference.py:114,131)
    control_depth: int = 0  # >0 enables the ControlNet-Half conditioned DiT

    @property
    def latent_factor(self) -> int:
        """VAE spatial downsampling (8 for SD VAE: ch_mult (1,2,4,4))."""
        return 2 ** (len(self.vae.ch_mult) - 1)

    # ---- model stage helpers (pure; params passed explicitly) -------------

    def clean(self, params, img, batched_stages: bool = False):
        """Stage-1 SwinIR degradation removal; [0,1]-ish NHWC in/out.

        NOT clamped: the reference encodes / color-fixes against the raw
        SwinIR output (test_scripts/inference.py:97-109 — only the final
        composite is clamped), so clamping here would be glue drift
        (caught by tests/test_e2e_process.py).

        Batch > 1 runs per-sample (lax.map) like decode: the N>1 conv
        layouts degrade 3.5x per image at 512² (data movement jumps to
        48% of device time — tools/trace_ops.py swinir b4 vs b1)."""

        def _clean(x):
            return self.swinir.apply({"params": params["swinir"]}, x)

        if img.shape[0] == 1 or batched_stages or _batched_conv_stages():
            return _clean(img)
        return jax.lax.map(lambda xi: _clean(xi[None])[0], img)

    def encode(self, params, img01, batched_stages: bool = False):
        """[0,1] image -> scaled latent (posterior mode), inference.py:106-109.

        Per-sample for batch > 1 (2.6x-per-image N>1 encoder conv-layout
        regression at 512², 49.5% data movement in the b4 trace)."""

        def _enc(x):
            z = self.vae.apply(
                {"params": params["vae"]}, x * 2.0 - 1.0, method=self.vae.encode_mode
            )
            return z * VAE_SCALE

        if img01.shape[0] == 1 or batched_stages or _batched_conv_stages():
            return _enc(img01)
        if _packed_decode():
            from instarevive_tpu.ops.packed_vae import encode_mode_packed

            z = encode_mode_packed(
                params["vae"], img01 * 2.0 - 1.0,
                ch=self.vae.ch, ch_mult=tuple(self.vae.ch_mult),
                num_res_blocks=self.vae.num_res_blocks,
                z_channels=self.vae.z_channels, embed_dim=self.vae.embed_dim,
                dtype=self.vae.dtype,
            )
            return z * VAE_SCALE
        return jax.lax.map(lambda xi: _enc(xi[None])[0], img01)

    def decode(self, params, z, batched_stages: bool = False):
        """Scaled latent -> [0,1]-ish image, inference.py:117.

        NOT clamped: the reference clamps only the final composite — the
        tiled pixel overlap-average and the color fix both consume the raw
        decode (inference.py:141-159), so clamping per tile is glue drift
        (caught by tests/test_e2e_process.py). Callers clamp their final
        output.

        Batch > 1 runs as a lax.map over single samples: XLA picks
        pathological layouts for the N>1 decoder convs (4.6x slower per
        image at N=2 — convert/select_bitcast/copy storms in the trace,
        tools/trace_decode.py), while the N=1 program is near-roofline."""

        def _dec(zi):
            img = self.vae.apply(
                {"params": params["vae"]}, zi / VAE_SCALE, method=self.vae.decode
            )
            return img / 2.0 + 0.5

        if z.shape[0] == 1 or batched_stages or _batched_conv_stages():
            return _dec(z)
        if _packed_decode():
            # batch-in-channels grouped-conv program: exact, one N=1 conv
            # stack with fat channels instead of the serial per-sample map
            from instarevive_tpu.ops.packed_vae import decode_packed

            img = decode_packed(
                params["vae"], z / VAE_SCALE,
                ch=self.vae.ch, ch_mult=tuple(self.vae.ch_mult),
                num_res_blocks=self.vae.num_res_blocks, dtype=self.vae.dtype,
            )
            return img / 2.0 + 0.5
        return jax.lax.map(lambda zi: _dec(zi[None])[0], z)

    def one_step(self, params, z_init, y, y_mask=None, c=None, dit_forward=None):
        """eps at t=maxt -> x0 (generate_sample_1step, generate.py:22-42).

        ``dit_forward`` overrides the DiT call (model-parallel dispatch,
        e.g. the pipeline-parallel path in :meth:`jitted_pp`); it receives
        ``(params, z, t_f32, y, y_mask)`` and must return the raw DiT
        output. No control branch under an override."""
        b = z_init.shape[0]
        t = jnp.full((b,), self.maxt, dtype=jnp.int32)
        if dit_forward is not None:
            if c is not None:
                raise NotImplementedError(
                    "dit_forward override has no ControlNet branch"
                )
            out = dit_forward(params, z_init, t.astype(jnp.float32), y, y_mask)
        else:
            kwargs = {}
            if c is not None:
                kwargs = dict(c=c, control_depth=self.control_depth)
            out = self.dit.apply(
                {"params": params["dit"]}, z_init, t.astype(jnp.float32), y,
                y_mask=y_mask, **kwargs,
            )
        eps = out[..., : z_init.shape[-1]]
        return eps_to_x0(self.sched, eps, z_init, t)

    # ---- full pipelines ----------------------------------------------------

    def process(
        self,
        params,
        lq,
        y,
        y_mask=None,
        *,
        use_swinir: bool = True,
        color_fix: str = "wavelet",
        use_control: bool = False,
        batched_stages: bool = False,
        dit_forward=None,
    ):
        """Non-tiled restoration of a x64-sized [0,1] NHWC batch.

        Intentional deviation (documented, PARITY.md): the reference's
        non-tiled branch never applies color correction — its ``--color_fix
        _type`` only takes effect inside the tiled loop (test_scripts/
        inference.py:112-117 vs :146-149). Here the fix applies in both
        paths so tiled and non-tiled outputs agree; pass
        ``--color_fix_type none`` for bit-faithful reference behavior.

        ``batched_stages=True`` skips the per-sample lax.map in the conv
        stages — required under data-parallel sharding (jitted_sharded),
        where lax.map over a sharded batch axis would serialize the mesh
        and each device locally sees the fast b=1 conv shapes anyway.
        """
        stage1 = self.clean(params, lq, batched_stages) if use_swinir else lq
        z_init = self.encode(params, stage1, batched_stages)
        c = z_init if use_control else None
        z0 = self.one_step(params, z_init, y, y_mask, c=c, dit_forward=dit_forward)
        out = self.decode(params, z0, batched_stages)
        if color_fix == "wavelet":
            out = wavelet_color_fix(out, stage1)
        elif color_fix == "adain":
            out = adain_color_fix(out, stage1)
        return jnp.clip(out, 0.0, 1.0)

    def process_tiled(
        self,
        params,
        lq,
        y,
        y_mask=None,
        *,
        tile_size: int = 512,
        tile_stride: int = 448,
        use_swinir: bool = True,
        color_fix: str = "wavelet",
        use_control: bool = False,
        tile_batch: int = 4,
    ):
        """Tiled restoration (inference.py:119-153): latent-space sliding
        windows with sum/count averaging, then a pixel-space pass that
        decodes each latent tile, color-fixes vs the SwinIR pixels, and
        overlap-averages. Both passes are lax.scans — fully on-device.

        Unlike the reference's serial Python tile loop, the one-step DiT
        runs on ``tile_batch`` tiles at once (vmapped gather -> batched
        forward -> sequential scatter-add) to keep the MXU fed on large
        images."""
        b, h, w, _ = lq.shape
        f = self.latent_factor
        lt, ls = tile_size // f, tile_stride // f  # latent tile geometry
        lh, lw = h // f, w // f

        stage1 = self.clean(params, lq) if use_swinir else lq
        z_init = self.encode(params, stage1)

        offsets_np = tile_grid(lh, lw, lt, ls)  # (n, 2) latent offsets
        n_tiles = len(offsets_np)
        # adaptive chunk size <= tile_batch: minimize padded tile-forwards
        # weighted by the measured small-batch penalty (b1 ~13% slower per
        # image than b4) — e.g. 9 tiles pick 3x3 chunks (zero padding)
        # instead of 4+4+4 with 3 dead tiles.
        tb_max = max(1, min(tile_batch, n_tiles))
        small_penalty = {1: 1.13, 2: 1.05}

        def _cost(t):
            padded = -(-n_tiles // t) * t
            return padded * small_penalty.get(t, 1.0)

        tb = min(range(1, tb_max + 1), key=lambda t: (_cost(t), -t))
        # pad the offset list so every chunk is full; padded tiles recompute
        # an existing tile but their weight is masked to zero.
        pad = (-n_tiles) % tb
        offs_padded = np.concatenate([offsets_np, np.repeat(offsets_np[-1:], pad, 0)])
        weights = np.concatenate([np.ones(n_tiles), np.zeros(pad)]).astype(np.float32)
        chunks = jnp.asarray(offs_padded.reshape(-1, tb, 2))
        wchunks = jnp.asarray(weights.reshape(-1, tb))

        def gather_tile(src, off, ch):
            return jax.lax.dynamic_slice(src, (0, off[0], off[1], 0), (b, lt, lt, ch))

        # pass 1: latent tiles -> one-step (batched over tb) -> overlap average
        def latent_body(carry, chunk_w):
            zsum, cnt = carry
            chunk, wgt = chunk_w
            tiles = jax.vmap(lambda o: gather_tile(z_init, o, 4))(chunk)  # (tb,b,lt,lt,4)
            flat = tiles.reshape(tb * b, lt, lt, 4)
            y_rep = jnp.tile(y, (tb, 1, 1))
            m_rep = jnp.tile(y_mask, (tb, 1)) if y_mask is not None else None
            c = flat if use_control else None
            outs = self.one_step(params, flat, y_rep, m_rep, c=c)
            outs = outs.reshape(tb, b, lt, lt, 4)

            def scatter(i, carry):
                zsum, cnt = carry
                hi, wi = chunk[i, 0], chunk[i, 1]
                wg = wgt[i]
                cur = jax.lax.dynamic_slice(zsum, (0, hi, wi, 0), (b, lt, lt, 4))
                upd = (cur + wg * outs[i].astype(jnp.float32)).astype(zsum.dtype)
                zsum = jax.lax.dynamic_update_slice(zsum, upd, (0, hi, wi, 0))
                ccur = jax.lax.dynamic_slice(cnt, (0, hi, wi, 0), (b, lt, lt, 1))
                cnt = jax.lax.dynamic_update_slice(cnt, (ccur + wg).astype(cnt.dtype), (0, hi, wi, 0))
                return zsum, cnt

            zsum, cnt = jax.lax.fori_loop(0, tb, scatter, (zsum, cnt))
            return (zsum, cnt), None

        (zsum, cnt), _ = jax.lax.scan(
            latent_body, (jnp.zeros_like(z_init), jnp.zeros((b, lh, lw, 1))),
            (chunks, wchunks),
        )
        z_avg = zsum / cnt

        # pass 2: per-tile decode + color fix -> pixel overlap average
        def pixel_body(carry, off):
            psum, pcnt = carry
            hi, wi = off[0], off[1]
            ztile = jax.lax.dynamic_slice(z_avg, (0, hi, wi, 0), (b, lt, lt, 4))
            img = self.decode(params, ztile)
            ph, pw = hi * f, wi * f
            ref_tile = jax.lax.dynamic_slice(stage1, (0, ph, pw, 0), (b, lt * f, lt * f, 3))
            if color_fix == "wavelet":
                img = wavelet_color_fix(img, ref_tile)
            elif color_fix == "adain":
                img = adain_color_fix(img, ref_tile)
            cur = jax.lax.dynamic_slice(psum, (0, ph, pw, 0), (b, lt * f, lt * f, 3))
            psum = jax.lax.dynamic_update_slice(
                psum, (cur + img).astype(psum.dtype), (0, ph, pw, 0)
            )
            ccur = jax.lax.dynamic_slice(pcnt, (0, ph, pw, 0), (b, lt * f, lt * f, 1))
            pcnt = jax.lax.dynamic_update_slice(pcnt, ccur + 1.0, (0, ph, pw, 0))
            return (psum, pcnt), None

        (psum, pcnt), _ = jax.lax.scan(
            pixel_body, (jnp.zeros_like(lq), jnp.zeros((b, h, w, 1))),
            jnp.asarray(offsets_np),
        )
        return jnp.clip(psum / pcnt, 0.0, 1.0)

    # ---- jit entry points --------------------------------------------------

    def jitted(self, tiled: bool = False, **kw) -> Callable:
        fn = self.process_tiled if tiled else self.process
        return jax.jit(partial(fn, **kw))

    def jitted_sharded(self, mesh, **kw) -> Callable:
        """Data-parallel multi-chip inference: ONE jitted program with the
        batch sharded over the mesh's ('data','fsdp') axes and params
        replicated — scaling over ICI instead of the reference's
        process-per-GPU serving. Global batch must be a multiple of the
        mesh size (serve.py pads micro-batches). Plain ``process`` only;
        per-sample maps are disabled (see ``batched_stages``)."""
        from instarevive_tpu.parallel import mesh as M

        fn = partial(self.process, batched_stages=True, **kw)
        rep = M.replicated(mesh)
        bs = M.batch_sharding(mesh)
        return jax.jit(fn, in_shardings=(rep, bs, bs), out_shardings=bs)

    def jitted_tp(self, mesh, **kw) -> Callable:
        """Tensor-parallel multi-chip inference (beyond reference — the
        reference serves one process per GPU with no intra-model
        parallelism): params sharded Megatron-style over the mesh's
        'tensor' axis (parallel/tp.py), batch sharded over 'data'/'fsdp'
        if those axes are >1, XLA inserting the per-block all-reduces.
        This is the latency lever: one image's DiT step is split across
        chips, unlike ``jitted_sharded`` which only scales throughput.

        The Pallas flash-attention kernel has no GSPMD partitioner, so
        the trace pins ``IR_ATTN_IMPL=xla``; calls must run inside
        ``with mesh:`` only at trace time (the constraint hooks probe the
        ambient mesh), which this wrapper handles itself."""
        import os

        from instarevive_tpu.parallel import tp as TP
        from instarevive_tpu.parallel import mesh as M

        fn = partial(self.process, batched_stages=True, **kw)
        jf = None  # built at first call (needs the params tree's shardings)

        def call(params, x, y):
            nonlocal jf
            if jf is None:
                ps = TP.tp_shardings(params, mesh)
                bs = M.batch_sharding(mesh)
                jf = jax.jit(fn, in_shardings=(ps, bs, bs), out_shardings=bs)
            old = os.environ.get("IR_ATTN_IMPL")
            os.environ["IR_ATTN_IMPL"] = "xla"
            try:
                with mesh:
                    return jf(params, x, y)
            finally:
                if old is None:
                    os.environ.pop("IR_ATTN_IMPL", None)
                else:
                    os.environ["IR_ATTN_IMPL"] = old
        return call

    def jitted_sp(self, mesh, **kw) -> Callable:
        """Sequence-parallel serving (beyond reference — parallel/sp.py):
        the DiT's latent token axis sharded over the mesh's 'seq' axis
        with per-block K/V all-gathers (exact global attention) — the
        lever for giant UN-TILED restorations where one chip's N² DiT
        attention no longer fits or dominates. Params stay replicated (SP
        shards activations, not weights); token count (H/16)·(W/16) is a
        multiple of 16 after the CLI's x64 padding, so any 'seq' size up
        to 16 divides it. Plain ``process`` only (no ControlNet branch,
        homogeneous stack — ``pixart_sp_forward`` asserts)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from instarevive_tpu.parallel.sp import pixart_sp_forward

        def dit_fwd(p, z, t, yy, y_mask):
            return pixart_sp_forward(self.dit, p["dit"], mesh, z, t, yy, y_mask)

        fn = partial(
            self.process, batched_stages=True, dit_forward=dit_fwd, **kw
        )
        rep = NamedSharding(mesh, P())
        return jax.jit(fn, in_shardings=(rep, rep, rep), out_shardings=rep)

    def jitted_pp(self, mesh, *, microbatches: int = 2, **kw) -> Callable:
        """Pipeline-parallel serving (beyond reference — parallel/pp.py):
        the DiT block stack runs GPipe-style over the mesh's 'pipe' axis
        with stage-resident weights, while SwinIR/VAE/color-fix stay
        replicated (<15% of pipeline FLOPs). This is the serving-memory
        lever: the blocks (90%+ of DiT params) are STRIPPED from the
        replicated param tree and enter only as the 'pipe'-sharded stacked
        operand, so no device ever materializes the full DiT. Plain
        ``process`` only (no ControlNet branch, homogeneous block stack —
        ``pixart_pp_forward`` asserts both); batch must be a multiple of
        ``microbatches`` (serve.py pads)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from instarevive_tpu.parallel.pp import (
            pixart_pp_forward, shard_stacked, stack_block_params,
        )

        def fn(params, stacked, lq, y):
            def dit_fwd(p, z, t, yy, y_mask):
                return pixart_pp_forward(
                    self.dit, p["dit"], mesh, z, t, yy, y_mask,
                    microbatches=microbatches, stacked=stacked,
                )

            return self.process(
                params, lq, y, batched_stages=True, dit_forward=dit_fwd, **kw
            )

        rep = NamedSharding(mesh, P())
        stk = NamedSharding(mesh, P("pipe"))
        jf = jax.jit(fn, in_shardings=(rep, stk, rep, rep), out_shardings=rep)
        cache: dict = {}

        def call(params, x, y):
            key = id(params)
            if cache.get("key") != key:
                stacked = shard_stacked(
                    stack_block_params(params["dit"], self.dit.depth), mesh
                )
                slim = dict(params)
                slim["dit"] = {
                    k: v for k, v in params["dit"].items()
                    if not k.startswith("blocks_")
                }
                cache.update(key=key, slim=slim, stacked=stacked)
            return jf(cache["slim"], cache["stacked"], x, y)

        return call
