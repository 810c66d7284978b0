"""End-to-end serving pipeline: raw events + blurred frames -> sharp frames.

ONE jitted device program: voxelization (XLA scatter on device), deblur
-voxel channel packing, and the recurrent network — no host round-trip
between stages (the reference pipeline voxelizes on the CPU dataloader and
ships 190MB voxel grids per HighREV sample; here only the compact event
list and two frames cross the bus).

Event capacity is shape-bucketed to powers of two so repeated calls reuse
compiled executables.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from refid_tpu.events.voxel import _voxelize_padded
from refid_tpu.models.refid import FinalBidirectionAttenfusion, RefidConfig

__all__ = ["BlurVFIPipeline", "SharpVFIPipeline"]


def _fast_serving_applicable(cfg: RefidConfig) -> bool:
    """True iff serve.fast_forward implements EXACTLY this configuration
    (it replays the production architecture; every axis it hard-codes must
    match or the math silently diverges/crashes — mirrored by the asserts
    at the top of fast_forward)."""
    return (cfg.bidirectional and cfg.aliased_backward_states
            and cfg.recurrent_cell == "simpleconv"
            and cfg.encoder_stage == "then_down"
            and cfg.num_block == 1 and cfg.siamese_fusion is None
            and cfg.decoder_type == "transpose_recurrent"
            and cfg.num_encoders >= 2  # packed decoder folds last 2 stages
            and cfg.apply_resblocks and cfg.bottleneck_img_add
            and not cfg.bidir_decoder and not cfg.use_first_dcn)


class BlurVFIPipeline:
    """Blurry-VFI serving: (blur0, blur1, events) -> 2m+n sharp frames.

    Replicates the GoProEventRecurrentDataset packing (26-ch input from
    2 RGB frames + intra-exposure voxel bins, image_npy_dataset.py:211-232)
    so released checkpoints serve directly.
    """

    def __init__(self, params, cfg: RefidConfig, m: int = 11, n: int = 1,
                 norm_voxel: bool = False, fast: Optional[bool] = None,
                 voxelizer: str = "scatter",
                 int8: Union[bool, str] = False,
                 mesh=None, scan: bool = False, scan_unroll: int = 1):
        self.params = params
        self.cfg = cfg
        self.m, self.n = m, n
        self.mesh = mesh  # optional jax.sharding.Mesh with a 'spatial'
        # axis: shards the frames (image height) across chips so ONE
        # stream's latency scales over ICI (GSPMD inserts the conv halo
        # exchanges — tests/test_spatial_sharding.py pins packed-serving
        # parity).  Build with parallel.make_mesh(data=1, spatial=N).
        self.num_bins = self._derive_num_bins(m, n)
        # user-facing argument validation raises (asserts vanish under -O)
        if voxelizer not in ("scatter", "pallas"):
            raise ValueError(f"voxelizer must be 'scatter' or 'pallas'; "
                             f"got {voxelizer!r}")
        self.voxelizer = voxelizer  # 'pallas': fully on-device sort +
        # one-hot-MXU kernel (events/voxel_pallas.voxelize_device) instead
        # of the XLA scatter
        if int8 not in (False, True, "scale0", "static"):
            raise ValueError(f"int8 must be False, True, 'scale0', or "
                             f"'static'; got {int8!r}")
        self.int8 = int8  # int8 MXU serving (NOT exact math —
        # serve/quant.py, dB-gated in tests/test_quant.py).  "static" =
        # widest coverage with CALIBRATED activation scales; requires one
        # .calibrate(...) call on representative inputs before serving.
        self._int8_scales = None
        self._int8_raw_amax = None
        self._int8_rms = None
        self._int8_exclude = None  # tuple of site indices served exact
        self.norm_voxel = norm_voxel  # parity: recurrent recipe skips norm
        self.model = FinalBidirectionAttenfusion(cfg)
        # the packed/width-folded serving forward (serve/fast_forward.py,
        # exact math, 46 vs 42 frames/s at 720p) replays the production
        # architecture only; auto-enable exactly when it applies
        if fast is None:
            fast = _fast_serving_applicable(cfg)
        self.fast = fast
        # scan=True serves through the width-folded lax.scan forward
        # (serve/fast_scan.py, exact math) instead of the trace-time-
        # unrolled fast_forward: ~20x smaller HLO, so it traces+compiles
        # in a fraction of the time at a modest throughput cost.  Used by
        # bench.py to guarantee a provisional result lands inside any
        # compile budget; also the right mode for one-off/interactive use
        # where compile latency dominates.
        if scan and not fast:
            raise ValueError("scan=True requires the fast serving path "
                             "(production config)")
        if scan and int8:
            raise ValueError("scan=True serving is bf16/f32 only")
        self.scan = scan
        self.scan_unroll = scan_unroll  # lax.scan unroll factor for
        # scan=True: k step bodies per while iteration — graph size (and
        # relay compile/load cost) scales with k, throughput approaches
        # the fully-unrolled path's as k grows

        def _prep(frame0, frame1, events, n_events, height, width):
            if self.voxelizer == "pallas":
                from refid_tpu.events.voxel_pallas import voxelize_device
                vox = voxelize_device(events, n_events,
                                      num_bins=self.num_bins, width=width,
                                      height=height)       # (bins, h, w)
            else:
                vox = _voxelize_padded(events, n_events, self.num_bins,
                                       width, height)      # (bins, h, w)
            vox = jnp.transpose(vox, (1, 2, 0))             # (h, w, bins)
            if self.norm_voxel:
                nz = vox != 0
                cnt = jnp.maximum(jnp.sum(nz), 1)
                mean = jnp.sum(vox) / cnt
                std = jnp.sqrt(jnp.sum(vox ** 2) / cnt - mean ** 2)
                vox = jnp.where(nz, (vox - mean) / std, 0.0)
            lq = self._make_lq(vox, frame0, frame1)[None]    # (1,h,w,chn)
            return vox, lq, self.num_bins - 1

        def _pack_pairs(vox, t):
            # emit the PRE-PACKED serving format straight from the voxel
            # grid: s2d(2,2) bin pairs (1, t, h/2, w/2, 8).  The
            # full-resolution 2-channel pair stack (64x lane-padded in
            # HBM) never materializes; XLA fuses the slice+reshape into
            # the scatter output.  Exactness: identical ops to
            # fast_forward's internal repack (tests/test_fast_forward).
            from refid_tpu.serve.packing import space_to_depth
            pairs_t = jnp.stack([vox[..., i:i + 2] for i in range(t)],
                                axis=0)                     # (t,h,w,2)
            return space_to_depth(pairs_t, 2)[None]         # (1,t,h/2,w/2,8)

        @partial(jax.jit,
                 static_argnames=("height", "width", "qscales", "qexclude"))
        def _run(params, frame0, frame1, events, n_events, height, width,
                 qscales=None, qexclude=None):
            vox, lq, t = _prep(frame0, frame1, events, n_events, height,
                               width)
            if self.fast and self.scan:
                from refid_tpu.serve.fast_scan import fast_apply_scan
                return fast_apply_scan(params, self.cfg, lq,
                                       _pack_pairs(vox, t),
                                       remat=False,
                                       unroll=self.scan_unroll)[0]
            if self.fast:
                from refid_tpu.serve import fast_forward
                qstate = None
                if self.int8 == "static":
                    if qscales is None:
                        raise ValueError(
                            "int8='static' serving requires calibration: "
                            "call pipe.calibrate(...) first")
                    qstate = {"amax": list(qscales),
                              "exclude": qexclude or ()}
                return fast_forward(params, self.cfg, lq,
                                    _pack_pairs(vox, t), packed=True,
                                    int8=self.int8, qstate=qstate)[0]
            pairs = jnp.stack([vox[..., i:i + 2] for i in range(t)],
                              axis=0)[None]                 # (1,t,h,w,2)
            return self.model.apply(params, lq, pairs)[0]   # (t,h,w,3)

        @partial(jax.jit, static_argnames=("height", "width"))
        def _calib(params, frame0, frame1, events, n_events, height, width):
            from refid_tpu.serve import fast_forward
            vox, lq, t = _prep(frame0, frame1, events, n_events, height,
                               width)
            q = {}
            out = fast_forward(params, self.cfg, lq, _pack_pairs(vox, t),
                               packed=True, int8="calib", qstate=q)
            return out[0], jnp.stack(q["amax"]), jnp.stack(q["rms"])

        self._run = _run
        self._calib_fn = _calib

    # --- task-specific hooks (overridden by SharpVFIPipeline) --------------

    def _derive_num_bins(self, m: int, n: int) -> int:
        return 2 * m + n + 1

    def _make_lq(self, vox, frame0, frame1):
        """Blur-VFI packing: 2 blurred frames + intra-exposure voxel bins
        (image_npy_dataset.py:211-221)."""
        m, n = self.m, self.n
        return jnp.concatenate(
            [frame0, vox[..., 1:m], frame1, vox[..., m + 2 + n:]], axis=-1)

    @staticmethod
    def _pad_events(events: np.ndarray, capacity: Optional[int]):
        n_ev = events.shape[0]
        if capacity is None:
            capacity = max(1 << 14, 1 << int(np.ceil(np.log2(max(n_ev, 1)))))
        padded = np.zeros((capacity, 4), np.float32)
        padded[:n_ev] = events
        return jnp.asarray(padded), jnp.int32(n_ev)

    def calibrate(self, blur0: np.ndarray, blur1: np.ndarray,
                  events: np.ndarray,
                  capacity: Optional[int] = None,
                  crop: Optional[tuple] = None,
                  headroom: float = 1.0,
                  accumulate: bool = False,
                  exclude_crest: Optional[float] = None) -> jnp.ndarray:
        """Record per-site activation amaxes for ``int8='static'`` serving
        (serve/quant.py).  Run once on representative inputs (same m/n —
        site order is matched by call order).  Returns the exact-math
        output of the calibration forward.

        ``accumulate=True`` folds this call's amaxes into any previously
        recorded scales by elementwise max — calibrate over SEVERAL
        representative windows for scales that cover the serving
        distribution instead of one sample's outliers.

        ``crop=(ch, cw)`` calibrates on the center crop instead of the
        full frame: per-tensor amaxes transfer across resolution (the
        trace path — hence site order — is resolution-independent), and
        the full-res calibration graph (exact forward + a live amax edge
        per conv site) needs ~18 GB HBM at 720p/t=23, over a v5e chip's
        16 GB.  ``headroom`` scales the recorded amaxes up as a guard
        against a crop underestimating full-frame outlier magnitudes.

        ``exclude_crest``: per-site bf16 fallback — sites whose calibrated
        crest factor (amax / rms) exceeds this threshold serve in EXACT
        math instead of int8 (a high crest factor means the per-tensor
        int8 scale wastes most of the 8-bit range on outliers, so that
        site's quantization error dominates).  None disables exclusion."""
        blur0, blur1 = np.asarray(blur0), np.asarray(blur1)
        events = np.asarray(events)
        if crop is not None:
            ch, cw = crop
            h, w = blur0.shape[:2]
            if not (0 < ch <= h and 0 < cw <= w):
                raise ValueError(f"calibrate crop {crop} exceeds the "
                                 f"frame ({h}, {w})")
            y0, x0 = (h - ch) // 2, (w - cw) // 2
            blur0 = blur0[y0:y0 + ch, x0:x0 + cw]
            blur1 = blur1[y0:y0 + ch, x0:x0 + cw]
            keep = ((events[:, 1] >= x0) & (events[:, 1] < x0 + cw)
                    & (events[:, 2] >= y0) & (events[:, 2] < y0 + ch))
            events = events[keep].copy()
            events[:, 1] -= x0
            events[:, 2] -= y0
        h, w = blur0.shape[:2]
        ev, n_ev = self._pad_events(events, capacity)
        out, amax, rms = self._calib_fn(
            self.params, jnp.asarray(blur0, jnp.float32),
            jnp.asarray(blur1, jnp.float32), ev, n_ev, height=h, width=w)
        # Accumulate RAW amaxes across windows and apply headroom once at
        # store time: max(amax_i) * headroom, not max(amax_i * headroom_i)
        # — a large headroom on one window must not mask a larger raw amax
        # observed in another.
        raw = tuple(float(a) for a in np.asarray(amax))
        rms = tuple(float(a) for a in np.asarray(rms))
        if accumulate and self._int8_raw_amax is not None:
            if len(raw) != len(self._int8_raw_amax):
                raise ValueError(
                    f"calibration site-count mismatch on accumulate: "
                    f"{len(raw)} vs {len(self._int8_raw_amax)} recorded")
            raw = tuple(max(a, b)
                        for a, b in zip(raw, self._int8_raw_amax))
            rms = tuple(max(a, b) for a, b in zip(rms, self._int8_rms))
        self._int8_raw_amax = raw
        self._int8_rms = rms
        self._int8_scales = tuple(a * headroom for a in raw)
        if exclude_crest is not None:
            self._int8_exclude = tuple(
                i for i, (a, r) in enumerate(zip(raw, rms))
                if a > exclude_crest * max(r, 1e-12))
        return out

    def save_calibration(self, path: str):
        """Persist the recorded int8 activation scales as JSON."""
        import json
        if self._int8_scales is None:
            raise ValueError("no calibration recorded: call calibrate()")
        with open(path, "w") as f:
            json.dump({"amax": list(self._int8_scales),
                       "rms": list(self._int8_rms or ()),
                       "exclude": list(self._int8_exclude or ())}, f)

    def load_calibration(self, path: str):
        """Load scales saved by :meth:`save_calibration` (deployments
        calibrate once offline, then serve ``int8='static'`` directly)."""
        import json
        with open(path) as f:
            d = json.load(f)
            self._int8_scales = tuple(float(a) for a in d["amax"])
            # Loaded scales already include the headroom applied at save
            # time; treat them as the raw floor for any further
            # accumulate-calibration (conservative: never shrinks).
            self._int8_raw_amax = self._int8_scales
            self._int8_rms = tuple(float(a) for a in d.get("rms", ())) \
                or None
            self._int8_exclude = tuple(
                int(i) for i in d.get("exclude", ())) or None

    def _put(self, arr, spatial_dim: Optional[int] = None):
        """Replicate (or shard ``spatial_dim`` over the mesh's 'spatial'
        axis) when a mesh is configured; no-op otherwise."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec
        spec = [None] * arr.ndim
        if spatial_dim is not None:
            spec[spatial_dim] = "spatial"
        return jax.device_put(arr, NamedSharding(self.mesh,
                                                 PartitionSpec(*spec)))

    def __call__(self, blur0: np.ndarray, blur1: np.ndarray,
                 events: np.ndarray,
                 capacity: Optional[int] = None) -> jnp.ndarray:
        """blur frames (h,w,3) RGB [0,1]; events (N,4) [t,x,y,p] sorted by t.
        Returns (2m+n, h, w, 3) device array of sharp frames."""
        h, w = blur0.shape[:2]
        ev, n_ev = self._pad_events(events, capacity)
        return self._run(self.params,
                         self._put(jnp.asarray(blur0, jnp.float32), 0),
                         self._put(jnp.asarray(blur1, jnp.float32), 0),
                         self._put(ev), n_ev,
                         height=h, width=w, qscales=self._int8_scales,
                         qexclude=self._int8_exclude)


class SharpVFIPipeline(BlurVFIPipeline):
    """Sharp-VFI serving: (sharp0, sharp1, events) -> n middle frames.

    Replicates the GoProSharpEventRecurrentDataset packing
    (image_sharp_npy_dataset.py:203-214 / data/datasets/base.py:273-276):
    the 26-ch input pads ZERO deblur bins around the two sharp frames so
    the same FinalBidirectionAttenfusion checkpoints serve both tasks.
    ``n+1`` voxel bins over the inter-frame window -> n adjacent-bin pairs
    -> n interpolated frames.
    """

    def __init__(self, params, cfg: RefidConfig, n: int = 7,
                 norm_voxel: bool = False, fast: Optional[bool] = None,
                 voxelizer: str = "scatter", int8: bool = False):
        super().__init__(params, cfg, m=1, n=n, norm_voxel=norm_voxel,
                         fast=fast, voxelizer=voxelizer, int8=int8)

    def _derive_num_bins(self, m: int, n: int) -> int:
        return n + 1  # sharp stream: the window ends ARE the inputs

    def _make_lq(self, vox, frame0, frame1):
        zeros = jnp.zeros(vox.shape[:2] + (10,), vox.dtype)
        return jnp.concatenate([frame0, zeros, frame1, zeros], axis=-1)
