"""Voxel-hash SLAM pipeline — the flagship model (BASELINE.json config 2).

Per-frame step, all inside one jitted computation:

    preprocess -> frame-to-model ICP -> hash alloc/compact/integrate
    -> (periodic GC) -> raycast model via the view-local dense cache

This is the reference's full intended system (SDF_Hashtable::integrate per
frame, SDF_Hashtable.cpp:11-40, plus the Align and raycast stages it never
wired together) with unbounded-scene storage via the deterministic hash
table and streaming garbage collection the reference lacked.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..geometry import se3
from ..ops import hash_ops
from ..ops import hash_raycast
from ..ops import icp as icp_ops
from ..ops import preprocess as pre_ops
from ..ops import raycast as rc_ops
from ..ops import splat as splat_ops


class HashSLAMState(NamedTuple):
    hmap: hash_ops.HashMap
    pose: jnp.ndarray           # (4, 4) camera-to-world of last frame
    model: pre_ops.Frame        # raycast model maps in last camera frame
    frame_idx: jnp.ndarray      # () int32
    vel: jnp.ndarray            # (4, 4) last tracked frame-to-frame motion


class StepInfo(NamedTuple):
    pose: jnp.ndarray
    icp_error: jnp.ndarray
    icp_count: jnp.ndarray
    icp_iters: jnp.ndarray
    tracked: jnp.ndarray
    blocks_allocated: jnp.ndarray   # this frame
    blocks_active: jnp.ndarray      # visible set size
    blocks_freed: jnp.ndarray       # by GC this frame
    free_blocks: jnp.ndarray        # heap headroom


def create(config: PipelineConfig) -> HashSLAMState:
    cam = config.camera
    H, W = cam.height, cam.width
    empty = pre_ops.Frame(
        vertices=jnp.zeros((H, W, 3), dtype=jnp.float32),
        normals=jnp.zeros((H, W, 3), dtype=jnp.float32),
        depth=jnp.zeros((H, W), dtype=jnp.float32),
    )
    return HashSLAMState(
        hmap=hash_ops.create(config.hash),
        pose=se3.identity(),
        model=empty,
        frame_idx=jnp.int32(0),
        vel=se3.identity(),
    )


@partial(jax.jit, static_argnames=("config",))
def step(
    state: HashSLAMState,
    depth_raw: jnp.ndarray,
    config: PipelineConfig,
):
    """One SLAM frame.  depth_raw: (H, W) uint16 in camera units."""
    cam = config.camera
    hcfg = config.hash
    frame = pre_ops.preprocess(depth_raw, cam, config.frontend)

    # --- track (frame-to-model) -------------------------------------------
    # constant-velocity prior: start the GN iteration at last frame's
    # tracked motion instead of identity — what keeps the linearization
    # inside its basin under fast motion (no reference counterpart: the
    # reference re-starts every Align at identity, CameraTracking.cpp:30)
    model_valid = jnp.sum(state.model.depth > 0) > 100
    prior = state.vel if config.icp.use_motion_prior else None
    if len(config.icp.pyramid) > 1:
        result = icp_ops.icp_align_pyramid(
            frame.depth, state.model.depth, cam, config.icp,
            src_full=frame, tgt_full=state.model, prior_T=prior,
        )
    else:
        result = icp_ops.icp_align(frame, state.model, cam, config.icp)
        if prior is not None:
            raced = icp_ops.icp_align(frame, state.model, cam, config.icp,
                                      init_T=prior)
            packed = icp_ops.pack_target(state.model)
            sn, sd = icp_ops.alignment_score_sums(
                raced.transform, frame, state.model, cam, config.icp,
                packed)
            bn, bd = icp_ops.alignment_score_sums(
                result.transform, frame, state.model, cam, config.icp,
                packed)
            result = icp_ops.pick_by_score(
                raced, result,
                sn / jnp.maximum(sd, 1.0), bn / jnp.maximum(bd, 1.0),
            )
    ok = (
        model_valid
        & (result.count > 100)
        & jnp.all(jnp.isfinite(result.transform))
        & icp_ops.motion_plausible(result.transform, config.icp)
    )
    T_rel = jnp.where(ok, result.transform, se3.identity())
    pose_new = state.pose @ T_rel

    # --- periodic garbage collection (before fusion, so the visible set
    # and the splat never reference rows freed this frame) ------------------
    if config.gc.enabled:
        def run_gc(m):
            return hash_ops.garbage_collect(
                m, hcfg, config.gc.min_weight, config.gc.max_blocks_per_gc,
                frame_idx=state.frame_idx, min_age=config.gc.min_age,
            )

        def no_gc(m):
            return m, jnp.int32(0)

        do_gc = (state.frame_idx % config.gc.interval) == (
            config.gc.interval - 1
        )
        hmap, n_freed = jax.lax.cond(do_gc, run_gc, no_gc, state.hmap)
    else:
        hmap, n_freed = state.hmap, jnp.int32(0)

    # --- map update: alloc -> compact -> integrate ------------------------
    hmap, active, n_alloc = hash_ops.fuse_frame(
        hmap, frame, pose_new, cam, hcfg, config.fusion,
        frame_idx=state.frame_idx,
    )

    # --- surface prediction for the next frame's tracking ------------------
    if config.raycast.mode == "splat":
        rc = splat_ops.splat_raycast(
            hmap, active, hcfg, pose_new, cam, config.raycast, config.fusion
        )
    else:
        rc = hash_raycast.raycast_hash(
            hmap,
            active,
            hcfg,
            pose_new,
            cam,
            config.raycast,
            config.fusion,
            cache_dims=config.raycast.cache_dims,
        )
    model = rc_ops.model_frame(rc)

    new_state = HashSLAMState(
        hmap=hmap,
        pose=pose_new,
        model=model,
        frame_idx=state.frame_idx + 1,
        vel=T_rel,
    )
    info = StepInfo(
        pose=pose_new,
        icp_error=result.error,
        icp_count=result.count,
        icp_iters=result.iters,
        tracked=ok,
        blocks_allocated=n_alloc,
        blocks_active=active.count,
        blocks_freed=n_freed,
        free_blocks=hmap.free_top,
    )
    return new_state, info


@functools.lru_cache(maxsize=None)
def make_step(config: PipelineConfig):
    """Jitted step with the state buffers DONATED: the big map arrays
    (tsdf/weight, 100s of MB at production scale) update in place instead
    of being copied every frame.  Callers must drop their reference to the
    passed-in state (the wrappers below reassign it)."""
    return jax.jit(
        lambda s, d: step(s, d, config), donate_argnums=0
    )


@functools.lru_cache(maxsize=None)
def make_scan_step(config: PipelineConfig):
    """Jitted multi-frame step: ``lax.scan`` of ``step`` over a stacked
    (K, H, W) depth chunk, state donated.

    One dispatch per K frames instead of per frame, with bit-identical
    per-frame results (tests/test_stream.py).  NOTE: measured on the
    tunneled chip this is SLOWER than back-to-back per-frame dispatches
    (BENCH_NOTES.md item 5) — async per-frame dispatches already pipeline,
    hiding the ~1.6 ms dispatch cost, and the scanned body runs slower per
    frame.  Use it when dispatch cannot pipeline (synchronous hosts) or
    for deterministic batch replay.  Returns (state, StepInfo stacked
    along axis 0).
    """

    def chunk(state, depths):
        return jax.lax.scan(
            lambda s, d: step(s, d, config), state, depths
        )

    return jax.jit(chunk, donate_argnums=0)


@functools.lru_cache(maxsize=None)
def make_evict(config: PipelineConfig):
    """Jitted eviction scan (state donated): pops blocks unseen for
    stream.max_age frames out of the map.  Returns (map, keys, payload
    [tsdf | weight], n): payload stays ON DEVICE so the host can pull a
    bucket-sized slice after reading ``n`` — fetching the full padded
    batch cost ~8 MB per evict cycle on the tunnel regardless of how few
    blocks actually evicted."""
    s = config.stream

    def evict(hmap, frame_idx):
        hmap, keys, tsdf, weight, born, n = hash_ops.evict_stale(
            hmap, config.hash, frame_idx, s.max_age, s.max_evict
        )
        # born rides as a float column (exact for frame counts < 2^24)
        payload = jnp.concatenate(
            [tsdf, weight, born.astype(jnp.float32)[:, None]], axis=1
        )
        return hmap, keys, payload, n

    return jax.jit(evict, donate_argnums=0)


@functools.lru_cache(maxsize=None)
def make_restore(config: PipelineConfig, batch: int):
    """Jitted restore for a ``batch``-sized padded upload (state donated):
    re-inserts stored blocks with their payload; returns (map, accepted).
    Compiled per power-of-two bucket so a handful of restored blocks does
    not cost a full max_restore-sized host->device transfer, and the
    whole batch arrives as ONE packed array
    [keys-bits | tsdf | weight | born] — each separate host->device
    upload pays a fixed tunnel cost.  ``born`` restores each row's
    original allocation stamp (exact de-integration across streaming)."""
    V = config.hash.voxels_per_block

    def restore(hmap, packed, frame_idx):
        keys = jax.lax.bitcast_convert_type(packed[:, 0], jnp.int32)
        tsdf = packed[:, 1 : 1 + V]
        weight = packed[:, 1 + V : 1 + 2 * V]
        born = packed[:, 1 + 2 * V].astype(jnp.int32)
        return hash_ops.restore_blocks(
            hmap, config.hash, keys, tsdf, weight, frame_idx,
            max_weight=config.fusion.max_weight, born_rows=born,
        )

    return jax.jit(restore, donate_argnums=0)


def _bucket(n: int, cap: int, floor: int = 1) -> int:
    """Smallest power of two >= n, floored and capped.

    The floor bounds how many distinct batch shapes (= jit compiles) a
    run can produce: measured on the tunnel, a host->device upload costs
    hundreds of ms REGARDLESS of size, so padding a restore batch up to
    256 rows is free while each extra bucket shape costs a mid-run
    compile (seconds even when the persistent cache hits)."""
    b = max(1, floor)
    while b < n:
        b *= 2
    return min(b, cap)


class HashSLAM:
    """Host-side convenience wrapper accumulating the trajectory.

    With ``config.stream.enabled`` the wrapper also runs the out-of-core
    streaming loop around the jitted step: before each frame it restores
    stored blocks entering the predicted frustum (pose @ vel), and every
    ``stream.interval`` frames it evicts blocks unseen for
    ``stream.max_age`` frames into the host BlockStore.
    """

    def __init__(self, config: PipelineConfig):
        self.config = config
        self.state = create(config)
        self._step = make_step(config)
        self._scan_step = None  # built lazily by process_chunk
        self.trajectory = []
        self.infos = []
        self.store = None
        if config.stream.enabled:
            from ..utils.blockstore import BlockStore

            self.store = BlockStore(config.hash)
            self._evict = make_evict(config)
            self._restore_jits = {}   # bucket size -> jit

    def _restore_for(self, batch: int):
        if batch not in self._restore_jits:
            self._restore_jits[batch] = make_restore(self.config, batch)
        return self._restore_jits[batch]

    def _stream_restore(self):
        """Restore stored blocks entering the predicted frustum.

        Runs every ``stream.interval`` frames (not per frame: the pose
        fetch it needs costs a tunnel RTT that stalls dispatch
        pipelining), predicting the camera ``interval`` frames ahead by
        the constant-velocity model — the frustum margin and eviction
        max_age absorb the prediction slack."""
        import numpy as np

        s = self.config.stream
        if not len(self.store):
            return
        pv = np.asarray(jnp.stack([self.state.pose, self.state.vel]))
        pose, vel = pv[0], pv[1]
        pred = pose @ np.linalg.matrix_power(vel, s.interval)
        keys = self.store.query_frustum(
            pred, self.config.camera, self.config.fusion,
            s.restore_margin_px, s.max_restore,
        )
        self._restore_keys(keys)

    def _restore_keys(self, keys) -> None:
        """Restore the given stored keys onto the device (ONE packed
        upload); shared by the streaming loop and the keyframe backend's
        incremental reintegration (which must pull a moved frame's
        frustums back on-device before de-integrating)."""
        import numpy as np

        s = self.config.stream
        if keys.size == 0:
            return
        tsdf, weight, born = self.store.rows_for(keys)
        # pad only to the bucket size (uploading the full max_restore
        # padding cost ~8 MB host->device per cycle) and pack keys +
        # payload into ONE upload; the 256 floor bounds compile variety
        b = _bucket(keys.shape[0], s.max_restore, floor=256)
        from ..geometry.coords import EMPTY_KEY

        V = self.config.hash.voxels_per_block
        packed = np.zeros((b, 2 + 2 * V), np.float32)
        packed[:, 0] = np.full(b, EMPTY_KEY, np.int32).view(np.float32)
        m = keys.shape[0]
        packed[:m, 0] = keys.view(np.float32)
        packed[:m, 1 : 1 + V] = tsdf
        packed[:m, 1 + V : 1 + 2 * V] = weight
        packed[:m, 1 + 2 * V] = born.astype(np.float32)
        hmap, accepted = self._restore_for(b)(
            self.state.hmap, jnp.asarray(packed), self.state.frame_idx,
        )
        self.state = self.state._replace(hmap=hmap)
        self.store.take(keys, np.asarray(accepted)[: keys.shape[0]])

    def _evict_into(self, hmap, frame_idx, store):
        """Run the eviction jit and move the evicted payload into
        ``store`` (bucket-sized device pull).  Shared by the streaming
        loop and the keyframe backend's map rebuild."""
        import numpy as np

        hmap, keys, payload, n = self._evict(hmap, frame_idx)
        n = int(n)
        if n > 0:
            # pull only a bucket-sized slice of the padded payload
            b = _bucket(n, self.config.stream.max_evict)
            V = self.config.hash.voxels_per_block
            arr = np.asarray(payload[:b])
            store.add(np.asarray(keys[:b]), arr[:, :V],
                      arr[:, V : 2 * V],
                      arr[:, 2 * V].astype(np.int32))
        return hmap

    def _stream_evict(self):
        hmap = self._evict_into(
            self.state.hmap, self.state.frame_idx, self.store
        )
        self.state = self.state._replace(hmap=hmap)

    def process(self, depth_raw) -> StepInfo:
        streaming = self.store is not None
        if streaming:
            # restore at batch starts only — every host fetch stalls the
            # dispatch pipeline for a full tunnel RTT
            if len(self.trajectory) % self.config.stream.interval == 0:
                self._stream_restore()
        self.state, info = self._step(self.state, jnp.asarray(depth_raw))
        self.trajectory.append(info.pose)
        self.infos.append(info)
        if streaming:
            # host-side frame count: no device sync to decide the cadence
            if len(self.trajectory) % self.config.stream.interval == 0:
                self._stream_evict()
        return info

    def process_chunk(self, depths_raw) -> StepInfo:
        """Process a stacked (K, H, W) chunk of frames in ONE device
        dispatch (jitted ``lax.scan``); per-frame results are identical to
        K ``process`` calls.  Returns the stacked StepInfo.

        With streaming enabled, restore/evict run at chunk boundaries
        (the in-chunk frames share one restore prediction)."""
        if self.store is not None:
            self._stream_restore()
        if self._scan_step is None:
            self._scan_step = make_scan_step(self.config)
        self.state, infos = self._scan_step(
            self.state, jnp.asarray(depths_raw)
        )
        k = int(infos.pose.shape[0])
        for i in range(k):
            self.trajectory.append(infos.pose[i])
            self.infos.append(jax.tree.map(lambda x, i=i: x[i], infos))
        if self.store is not None:
            self._stream_evict()
        return infos

    def render(self, pose=None) -> rc_ops.RaycastOutput:
        """Render from an arbitrary viewpoint (defaults to current pose),
        honoring the configured surface-prediction mode."""
        pose = self.state.pose if pose is None else jnp.asarray(pose)
        active = hash_ops.compact_visible(
            self.state.hmap, self.config.hash, pose, self.config.camera,
            self.config.fusion,
        )
        if self.config.raycast.mode == "splat":
            return splat_ops.splat_raycast(
                self.state.hmap, active, self.config.hash, pose,
                self.config.camera, self.config.raycast, self.config.fusion,
            )
        return hash_raycast.raycast_hash(
            self.state.hmap, active, self.config.hash, pose,
            self.config.camera, self.config.raycast, self.config.fusion,
            cache_dims=self.config.raycast.cache_dims,
        )
