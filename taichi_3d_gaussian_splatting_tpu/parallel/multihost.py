"""Multi-host (multi-process) SPMD training: DCN+ICI mesh, per-host data.

The reference is strictly single-process (SURVEY.md §2.5); this is the
scaling layer BASELINE targets at ">= 2 hosts". Design (SURVEY.md §5
"Distributed communication backend", §7 step 6, scaling-book recipe):

- `jax.distributed.initialize` wires the processes into one runtime
  (TPU pods: zero-config from the environment; CPU test rigs: explicit
  coordinator/num_processes/process_id with Gloo collectives);
- ONE flat `data` mesh axis over `jax.devices()` — the GLOBAL device
  list, so the axis spans ICI within a host/slice and DCN across hosts.
  `lax.psum/pmean` over it lower to hierarchical collectives (XLA routes
  the intra-slice part over ICI and only the cross-slice reduction over
  DCN), which is exactly the scaling-book layout for pure data
  parallelism — no code in this repo addresses networks directly;
- per-host data loading: every process draws the SAME deterministic
  global camera-index stream (shared seed), then loads IMAGE PIXELS only
  for its local devices' slice (`GlobalShuffleSampler.local_slice`).
  The global batch array is assembled zero-copy with
  `jax.make_array_from_process_local_data` — no host ever materializes
  another host's cameras;
- everything downstream (`data_parallel.make_dp_train_step`) is
  mesh-agnostic: the same shard_map step runs unchanged on a
  single-process or a multi-host mesh.

Division of labor vs `parallel/data_parallel.py`: that module owns the
step math; this one owns process bootstrap, global-mesh construction,
host-local -> global array assembly and the per-host sampler.
"""
from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, List, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the distributed runtime (idempotent).

    On TPU pods all arguments may be None — `jax.distributed.initialize`
    reads the topology from the environment. On CPU/GPU test rigs pass
    coordinator/num_processes/process_id explicitly; CPU collectives are
    forced to Gloo (the only cross-process CPU backend in this jax).
    """
    # idempotence check WITHOUT touching the backend (jax.process_count()
    # would initialize XLA, after which distributed.initialize refuses)
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except Exception:
        pass
    if coordinator_address is not None and num_processes == 1:
        return  # degenerate single-process "cluster"
    try:
        # no-op on backends that don't support it (set before backend init)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # fallback idempotence path: the private global_state probe above
        # may stop working on a jax upgrade — treat the runtime's own
        # "already initialized" refusal as success, re-raise anything else
        if "already initialized" not in str(e).lower():
            raise


def make_global_mesh(axis: str = "data") -> Mesh:
    """Flat mesh over the GLOBAL device list (ICI + DCN in one axis)."""
    return Mesh(np.asarray(jax.devices()), axis_names=(axis,))


def is_main() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0


def global_shard_batch(mesh: Mesh, *arrays: np.ndarray, batch_axis: int = 0):
    """Host-LOCAL per-camera arrays -> global arrays sharded over the mesh.

    Each process passes the rows for its own local devices (in mesh
    order); `jax.make_array_from_process_local_data` stitches the global
    view without any cross-host pixel traffic. ``batch_axis=1`` handles
    (S, B_local, ...) dispatch-window stacks."""
    spec = P(*([None] * batch_axis + ["data"]))
    sharding = NamedSharding(mesh, spec)
    return tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in arrays
    )


def global_replicate(mesh: Mesh, tree):
    """Replicate a (host-identical) pytree over every device of the mesh.

    Every process must pass the same values — true by construction here
    (state is built from the shared config seed / checkpoint)."""
    sharding = NamedSharding(mesh, P())

    def put(a):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(a))

    return jax.tree.map(put, tree)


class GlobalShuffleSampler:
    """Deterministic shared-seed camera-index stream, sliced per host.

    Every process constructs the identical stream (same seed => same
    epoch permutations); `next_global(count)` advances it by one step's
    global batch and `local_slice` cuts out this host's rows. This is the
    JAX multi-host SPMD convention: data DECISIONS are global and
    replicated, data LOADING is local (SURVEY.md §5)."""

    def __init__(self, num_items: int, seed: int = 0, shuffle: bool = True):
        self.num_items = num_items
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self._queue: List[int] = []

    def next_global(self, count: int) -> List[int]:
        self._fill(count)
        out, self._queue = self._queue[:count], self._queue[count:]
        return out

    def peek_global(self, count: int) -> List[int]:
        """The indices the next ``next_global(count)`` will return, WITHOUT
        consuming them (deterministic: the queue extension is committed).
        Lets the trainer prefetch-decode the next window's images while the
        current window runs on device."""
        self._fill(count)
        return list(self._queue[:count])

    def _fill(self, count: int) -> None:
        while len(self._queue) < count:
            order = np.arange(self.num_items)
            if self.shuffle:
                self.rng.shuffle(order)
            self._queue.extend(order.tolist())

    @staticmethod
    def local_slice(global_indices: Sequence[int], per_step: int,
                    local_per_step: int, local_offset: int) -> List[int]:
        """Rows of this host within each step's global batch.

        ``global_indices`` is a window of S steps x per_step cameras;
        host h (offset = h * local_per_step) owns rows
        [offset, offset + local_per_step) of every step."""
        assert len(global_indices) % per_step == 0
        out: List[int] = []
        for s in range(len(global_indices) // per_step):
            base = s * per_step + local_offset
            out.extend(global_indices[base: base + local_per_step])
        return out


def local_batch_offset() -> int:
    """First global-batch row owned by this process.

    Global batch rows follow mesh (= `jax.devices()`) order; a process's
    rows are the positions of its local devices in that list. jax
    guarantees contiguous blocks per process for the default device
    order, asserted here."""
    devices = jax.devices()
    local_set = {d.id for d in jax.local_devices()}
    positions = [i for i, d in enumerate(devices) if d.id in local_set]
    assert positions == list(range(positions[0],
                                   positions[0] + len(positions))), (
        "local devices are not contiguous in jax.devices() order; "
        "per-host batch slicing needs a custom device order")
    return positions[0]


class ThreadedIndexLoader:
    """Load dataset items for explicit index lists on a thread pool.

    The multihost analogue of `PrefetchLoader`: ordering is decided by
    the sampler (not an internal stream), decode happens on threads (PIL
    releases the GIL). ``submit``/futures let the trainer overlap the next
    window's decode with the current window's device time.

    ``expected_hw``: the (h, w) every record's metadata maps to
    (check_uniform_resolution). The resolution decision is made from
    metadata BEFORE any pixel is read, but ImagePoseDataset derives the
    actual shape from the DECODED image (metadata/file mismatch is legal
    single-host, it just rescales intrinsics) — on a multihost mesh a
    mismatching file would make hosts compile different programs and
    deadlock the collectives with no diagnostic, so each decoded item is
    checked here and the offending image named."""

    def __init__(self, dataset, num_threads: int = 4,
                 expected_hw: Optional[tuple] = None):
        self.dataset = dataset
        self.expected_hw = expected_hw
        self.pool = ThreadPoolExecutor(
            max_workers=max(num_threads, 1),
            thread_name_prefix="mh-dataset-decode")

    def _fetch(self, index: int):
        item = self.dataset[index]
        if self.expected_hw is not None:
            hw = (item.camera_info.camera_height,
                  item.camera_info.camera_width)
            if hw != tuple(self.expected_hw):
                path = None
                try:
                    path = self.dataset.records[index].get("image_path")
                except Exception:
                    pass
                raise ValueError(
                    f"dataset item {index} ({path!r}) decoded to {hw} but "
                    f"its metadata maps to {tuple(self.expected_hw)} — on "
                    "a multihost mesh this would desynchronize the hosts. "
                    "Fix the image file or its camera_height/camera_width "
                    "metadata.")
        return item

    def submit(self, indices: Iterable[int]):
        """Futures for each index, in order (gather with .result())."""
        return [self.pool.submit(self._fetch, i) for i in indices]

    def load(self, indices: Iterable[int]):
        return [f.result() for f in self.submit(indices)]


def expected_resolution(record: dict, tile_size: int) -> tuple:
    """(h, w) a record will decode to, from metadata alone (the dataset's
    >1600px auto-downscale + tile-multiple crop arithmetic,
    data/dataset.py). Multihost batching requires a resolution decision
    BEFORE any pixel is read, identically on every host."""
    from taichi_3d_gaussian_splatting_tpu.data.dataset import (
        MAX_RESOLUTION_TRAIN,
    )

    h = int(record["camera_height"])
    w = int(record["camera_width"])
    if h > MAX_RESOLUTION_TRAIN or w > MAX_RESOLUTION_TRAIN:
        short, long = (w, h) if w <= h else (h, w)
        scale = 1024 / short
        if long * scale > MAX_RESOLUTION_TRAIN:
            scale = MAX_RESOLUTION_TRAIN / long
        w, h = round(w * scale), round(h * scale)
    return h - h % tile_size, w - w % tile_size


def check_uniform_resolution(records: Sequence[dict], tile_size: int) -> tuple:
    """Multihost training requires one resolution bucket per dataset (all
    hosts must compile/run the SAME program each step; per-host
    mixed-resolution regrouping cannot be coordinated without pixel
    reads). Returns the (h, w) every record maps to, or raises."""
    sizes = {expected_resolution(r, tile_size) for r in records}
    if len(sizes) != 1:
        raise ValueError(
            "multihost training requires a uniform-resolution dataset; "
            f"metadata maps to {sorted(sizes)}. Re-export the dataset at "
            "one resolution (the reference datasets are uniform).")
    return next(iter(sizes))
