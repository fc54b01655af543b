"""Data pipeline.

Equivalents of reference datasets/datasets_classes.py (single_image /
multiple_images) re-designed for a TPU host loop: the source image(s) are
decoded once into a pinned uint8 numpy array; every training step draws a
whole *batch* of random crops with vectorised numpy indexing (the reference
crops one sample at a time through PIL inside DataLoader workers); the
normalised batch is shipped to device asynchronously by a double-buffering
prefetcher so host work overlaps device compute.

The "dataset" is virtual: its length is ``--sampling`` (default 8000)
regardless of the image size (reference datasets_classes.py:40-44).
"""

from __future__ import annotations

import functools
import os
import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np


def _load_image(path: str, ext: str) -> np.ndarray:
    """Decode an image file to (H, W, C) uint8 (or float for .txt grids).

    ``.txt`` holds whitespace-separated binary geological images
    (reference datasets_classes.py:21-23)."""
    if ext == "txt" or path.endswith(".txt"):
        arr = np.loadtxt(path).astype(np.float32)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        # values assumed already normalised in [0, 1]
        return (arr * 255.0).clip(0, 255).astype(np.uint8)
    from PIL import Image

    img = Image.open(path)
    if img.mode not in ("RGB", "L"):
        img = img.convert("RGB")
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top : top + size, left : left + size]


def _normalize(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (ToTensor + Normalize(0.5, 0.5),
    reference datasets_classes.py:36-38)."""
    return batch_u8.astype(np.float32) / 127.5 - 1.0


class SingleImageDataset:
    """One texture image; every sample is a random (or center) crop.

    ``sample_batch`` produces a whole batch at once: random offsets are drawn
    with numpy and the crops gathered by fancy indexing — O(batch) host work,
    no per-sample Python loop or PIL round trip.
    """

    def __init__(
        self,
        path: str,
        ext: str = "jpg",
        center_crop: Optional[int] = None,
        random_crop: Optional[int] = None,
        sampling: Optional[int] = 8000,
    ):
        self.img = _load_image(path, ext)
        self.center_crop = center_crop
        self.random_crop = random_crop
        self.sampling = sampling
        if center_crop:
            self.img = _center_crop(self.img, center_crop)

    def __len__(self) -> int:
        return self.sampling if self.sampling else 10000

    @property
    def img_ch(self) -> int:
        return self.img.shape[-1]

    def sample_batch(self, rng: np.random.Generator, batch_size: int) -> np.ndarray:
        h, w, c = self.img.shape
        if self.random_crop:
            s = self.random_crop
            tops = rng.integers(0, h - s + 1, size=batch_size)
            lefts = rng.integers(0, w - s + 1, size=batch_size)
            # gather via broadcasted index arithmetic: (B, s, s, C)
            row_idx = tops[:, None] + np.arange(s)[None, :]
            col_idx = lefts[:, None] + np.arange(s)[None, :]
            crops = self.img[row_idx[:, :, None], col_idx[:, None, :], :]
            return _normalize(crops)
        # center-cropped or whole image, replicated across the batch
        return _normalize(np.broadcast_to(self.img, (batch_size, h, w, c)).copy())


class MultipleImagesDataset:
    """Directory of images with optional resize/crop
    (reference datasets_classes.py:54-128). Decoded lazily and cached."""

    def __init__(
        self,
        path: str,
        ext: str = "jpg",
        center_crop: Optional[int] = None,
        random_crop: Optional[int] = None,
        resize: Optional[Tuple[int, int]] = None,
        sampling: Optional[int] = None,
        seed: int = 0,
    ):
        self.path = path
        self.ext = ext
        self.center_crop = center_crop
        self.random_crop = random_crop
        self.resize = resize
        self.sampling = sampling
        files = sorted(os.listdir(path))
        if sampling and sampling < len(files):
            rng = np.random.default_rng(seed)
            files = list(rng.choice(files, size=sampling, replace=False))
        self.files = files
        self._cache: dict[str, np.ndarray] = {}

    def __len__(self) -> int:
        return self.sampling if self.sampling else len(self.files)

    def _get(self, name: str) -> np.ndarray:
        if name not in self._cache:
            arr = _load_image(os.path.join(self.path, name), self.ext)
            if self.resize is not None:
                from PIL import Image

                h, w = self.resize
                im = Image.fromarray(arr.squeeze(-1) if arr.shape[-1] == 1 else arr)
                arr = np.asarray(im.resize((w, h)))
                if arr.ndim == 2:
                    arr = arr[:, :, None]
            self._cache[name] = arr
        return self._cache[name]

    def _preprocessed(self, name: str) -> np.ndarray:
        """One image with the DETERMINISTIC part of the sample pipeline
        applied (everything except the random crop): center crop + resize to
        64 when --center_crop is set (reference datasets_classes.py:77-79),
        else the raw (optionally --resize'd) image."""
        arr = self._get(name)
        if self.center_crop:
            arr = _center_crop(arr, self.center_crop)
            from PIL import Image

            im = Image.fromarray(arr.squeeze(-1) if arr.shape[-1] == 1 else arr)
            arr = np.asarray(im.resize((64, 64)))
            if arr.ndim == 2:
                arr = arr[:, :, None]
        return arr

    def sample_batch(self, rng: np.random.Generator, batch_size: int) -> np.ndarray:
        names = rng.choice(self.files, size=batch_size)
        out = []
        for name in names:
            arr = self._preprocessed(name)
            if not self.center_crop and self.random_crop:
                s = self.random_crop
                h, w = arr.shape[:2]
                top = int(rng.integers(0, h - s + 1))
                left = int(rng.integers(0, w - s + 1))
                arr = arr[top : top + s, left : left + s]
            out.append(arr)
        return _normalize(np.stack(out))

    def _stack_meta(self):
        """Post-preprocess (h, w, channels) of every image WITHOUT decoding
        pixel data where possible: PIL's lazy ``open`` reads only the header
        (size + mode), so a large directory does not pay a full-decode
        startup stall just to learn it exceeds the device cap. ``.txt``
        grids (no header) and already-cached images use the decoded array.
        Validates stackability — raises ValueError on mixed channel counts,
        or differing sizes with no crop to equalize them."""
        hs, ws, chans = [], [], []
        for name in self.files:
            p = os.path.join(self.path, name)
            if name in self._cache or self.ext == "txt" or p.endswith(".txt"):
                a = self._preprocessed(name)
                h, w, c = a.shape
            else:
                from PIL import Image

                with Image.open(p) as im:
                    w, h = im.size
                    # _load_image converts anything not RGB/L to RGB
                    c = 1 if im.mode == "L" else 3
                if self.resize is not None:
                    h, w = self.resize
                if self.center_crop:
                    h = w = 64  # _preprocessed: center crop -> resize(64)
            hs.append(h)
            ws.append(w)
            chans.append(c)
        hs = np.asarray(hs, np.int32)
        ws = np.asarray(ws, np.int32)
        if len(set(chans)) != 1:
            raise ValueError(
                f"images mix channel counts {sorted(set(chans))} — cannot "
                "stack on device"
            )
        crop = None if self.center_crop else self.random_crop
        if crop:
            if int(hs.min()) < crop or int(ws.min()) < crop:
                raise ValueError(
                    f"--random_crop {crop} exceeds the smallest image "
                    f"({int(hs.min())}x{int(ws.min())})"
                )
        elif int(hs.min()) != int(hs.max()) or int(ws.min()) != int(ws.max()):
            raise ValueError(
                "images differ in size and no crop equalizes them — "
                "cannot stack on device"
            )
        return hs, ws, chans[0]

    def stacked_nbytes(self) -> int:
        """uint8 bytes of the padded device stack :meth:`stacked_images`
        would build (also validates stackability). Header-only — no image
        is decoded."""
        hs, ws, c = self._stack_meta()
        return len(self.files) * int(hs.max()) * int(ws.max()) * c

    def stacked_images(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All images as ONE (N, Hmax, Wmax, C) uint8 array (zero-padded to
        the largest per-axis extent) plus per-image valid extents (N,) int32
        ``h_valid``/``w_valid`` — the device-resident form consumed by
        :func:`sample_multi_crops_body`."""
        self._stack_meta()  # validate before paying the full decode
        arrs = [self._preprocessed(n) for n in self.files]
        hs = np.array([a.shape[0] for a in arrs], np.int32)
        ws = np.array([a.shape[1] for a in arrs], np.int32)
        stacked = np.zeros(
            (len(arrs), int(hs.max()), int(ws.max()), arrs[0].shape[-1]),
            np.uint8,
        )
        for i, a in enumerate(arrs):
            stacked[i, : a.shape[0], : a.shape[1]] = a
        return stacked, hs, ws


class DeviceCropSampler:
    """Random-crop sampling ON DEVICE for single-image training.

    The source texture is tiny (~1MB); shipping 64 crops of 192^2 to the
    device every step costs ~28MB of H2D per step — orders of magnitude more
    than the image itself. Instead the uint8 image lives in HBM once and a
    jitted sampler draws crop offsets with jax.random and gathers + normalizes
    the batch on device (reference semantics: RandomCrop + ToTensor +
    Normalize(0.5, 0.5), datasets_classes.py:31-44). Replaces the host
    Prefetcher for ``single_image`` runs.
    """

    def __init__(self, dataset: "SingleImageDataset", device_put=None, mesh=None):
        import jax

        if mesh is not None:
            # replicate the tiny source image across the mesh and have the
            # jitted sampler emit the batch already sharded on its leading
            # axis — no per-step device-to-device re-shard
            from jax.sharding import NamedSharding, PartitionSpec as P

            put = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
            self._out_sharding = NamedSharding(mesh, P("data"))
        else:
            put = device_put or jax.device_put
            self._out_sharding = None
        self.img = put(dataset.img)  # (H, W, C) uint8 on device
        self.random_crop = dataset.random_crop

    kind = "single"

    def sample(self, key, batch_size: int):
        crops, bcast, _, _ = _device_samplers(self._out_sharding)
        if self.random_crop:
            return crops(self.img, key, self.random_crop, batch_size)
        return bcast(self.img, batch_size)


class DeviceMultiImageSampler:
    """Multi-image analog of :class:`DeviceCropSampler`: every decoded
    (deterministically preprocessed) image lives in HBM once as one padded
    uint8 stack, and a jitted body draws (image, crop) per batch element on
    device — no per-step host sampling or H2D (which through a ~15 MB/s
    dispatch link costs more per STEP than the whole dataset costs ONCE).
    Enables the superstep for ``multiple_images`` runs.

    ``img`` is the pytree handed to the superstep: ``(imgs, h_valid,
    w_valid)`` for random-crop datasets, ``imgs`` alone for equalized
    (center-crop/resize) datasets.
    """

    kind = "multi"

    #: fall back to the host Prefetcher above this device footprint
    MAX_DEVICE_MB = 1024.0

    def __init__(self, dataset: "MultipleImagesDataset", device_put=None, mesh=None):
        import jax

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            put = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
            self._out_sharding = NamedSharding(mesh, P("data"))
        else:
            put = device_put or jax.device_put
            self._out_sharding = None
        stacked, hs, ws = dataset.stacked_images()
        self.imgs = put(stacked)
        self.h_valid = put(hs)
        self.w_valid = put(ws)
        self.random_crop = None if dataset.center_crop else dataset.random_crop

    @classmethod
    def maybe_build(cls, dataset, device_put=None, mesh=None, max_mb=None,
                    batch_size=None, seed: int = 0):
        """Build when the stacked dataset fits on device; datasets OVER the
        cap get a :class:`RotatingMultiImageSampler` (HBM-resident subset
        swapped at dispatch boundaries) when a >=2-image window fits, and
        only fall back to the host :class:`Prefetcher` (``(None, reason)``)
        when even that is impossible. Stackability errors (a crop larger
        than the smallest image, mixed channel counts, unequalized sizes)
        RAISE — the host path's ``np.stack`` would crash on the same
        condition anyway, possibly many steps into training when the bad
        pair is finally drawn — EXCEPT at ``batch_size == 1``, where every
        host batch stacks a single image and D is fully convolutional, so
        variable-size no-crop runs genuinely work: those fall back with a
        notice."""
        try:
            stacked_mb = dataset.stacked_nbytes() / 2**20
        except ValueError as e:
            if batch_size == 1:
                return None, f"{e}; batch_size=1 host batches still work"
            raise
        limit = cls.MAX_DEVICE_MB if max_mb is None else max_mb
        if stacked_mb > limit:
            try:
                return RotatingMultiImageSampler(
                    dataset, limit, device_put=device_put, mesh=mesh,
                    seed=seed,
                ), None
            except ValueError as e:
                return None, (
                    f"stacked dataset is {stacked_mb:.0f} MB on device "
                    f"(> {limit:.0f} MB cap) and no rotating subset fits "
                    f"({e})"
                )
        return cls(dataset, device_put=device_put, mesh=mesh), None

    @property
    def img(self):
        if self.random_crop:
            return (self.imgs, self.h_valid, self.w_valid)
        return self.imgs

    def sample(self, key, batch_size: int):
        _, _, multi, pick = _device_samplers(self._out_sharding)
        if self.random_crop:
            return multi(
                self.imgs, self.h_valid, self.w_valid, key,
                self.random_crop, batch_size,
            )
        return pick(self.imgs, key, batch_size)


class RotatingMultiImageSampler:
    """On-device multi-image sampling for datasets whose padded stack
    EXCEEDS the device cap: a resident SUBSET of images lives in HBM and is
    swapped at dispatch boundaries, instead of dropping to the wire-bound
    host Prefetcher (~28 MB of H2D per step vs subset_bytes per K-step
    dispatch — and the swap H2D is staged one window AHEAD, so it overlaps
    the current dispatch's compute).

    Distribution: each epoch walks a seeded permutation of the images in
    windows of ``subset_size`` (wrapping cyclically), and the in-jit body
    draws uniformly over the resident window — so per epoch every image's
    expected draw count is equal (uniform marginal, the reference's
    random-file-choice semantics, datasets_classes.py:85-128; images in
    different windows never co-occur in one batch, a joint-distribution
    difference the GAN objective does not observe). The permutation
    derives from (seed, epoch), so ``--resume`` replays the same windows
    (deterministic-resume contract).

    Interface: ``prepare_epoch(epoch)`` once per epoch, ``img_for_chunk()``
    per superstep dispatch (returns the window pytree and stages the next
    window's H2D), ``sample(key, batch)`` for the per-step path (uses one
    window per epoch)."""

    kind = "multi"

    def __init__(self, dataset: "MultipleImagesDataset", cap_mb: float,
                 device_put=None, mesh=None, seed: int = 0):
        import jax

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._put = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
            self._out_sharding = NamedSharding(mesh, P("data"))
        else:
            self._put = device_put or jax.device_put
            self._out_sharding = None
        stacked, hs, ws = dataset.stacked_images()
        self._stack, self._hs, self._ws = stacked, hs, ws
        n = stacked.shape[0]
        per_img = stacked[0].nbytes
        # double-buffered (current + staged-next window both resident):
        # each window gets half the cap
        m = int(cap_mb * 2**20 / 2 // per_img)
        if m < 2 or m >= n:
            raise ValueError(
                f"rotating subset needs 2 <= subset < n_images "
                f"(cap {cap_mb:.0f} MB fits {m} of {n} padded images)"
            )
        self.subset_size = m
        self.n_images = n
        self.random_crop = None if dataset.center_crop else dataset.random_crop
        self.seed = seed
        self._order = None
        self._pos = 0
        self._cur = None
        self._nxt = None

    def _stage_next(self) -> None:
        idx = np.take(
            self._order, np.arange(self._pos, self._pos + self.subset_size),
            mode="wrap",
        )
        self._pos = (self._pos + self.subset_size) % self.n_images
        # device_put returns without waiting for the copy: the H2D of the
        # NEXT window streams while the CURRENT dispatch computes
        self._nxt = (
            self._put(self._stack[idx]),
            self._put(self._hs[idx]),
            self._put(self._ws[idx]),
        )

    def prepare_epoch(self, epoch: int) -> None:
        rng = np.random.default_rng([self.seed, epoch])
        self._order = rng.permutation(self.n_images)
        self._pos = 0
        self._cur = None
        self._stage_next()

    def img_for_chunk(self):
        """The resident window pytree for the NEXT superstep dispatch;
        stages the following window's H2D behind it."""
        if self._order is None:
            self.prepare_epoch(0)
        self._cur = self._nxt
        self._stage_next()
        imgs, hs, ws = self._cur
        return (imgs, hs, ws) if self.random_crop else imgs

    @property
    def img(self):
        return self.img_for_chunk()

    def sample(self, key, batch_size: int):
        if self._cur is None:
            self.img_for_chunk()
        imgs, hs, ws = self._cur
        _, _, multi, pick = _device_samplers(self._out_sharding)
        if self.random_crop:
            return multi(imgs, hs, ws, key, self.random_crop, batch_size)
        return pick(imgs, key, batch_size)


def sample_crops_body(img, key, crop: int, batch: int):
    """In-jit random-crop batch: (H, W, C) uint8 -> (batch, crop, crop, C)
    float32 in [-1, 1] (reference RandomCrop + ToTensor + Normalize(0.5),
    datasets_classes.py:31-44).

    THE single copy of the crop-sampling body — both DeviceCropSampler
    (per-step path) and train_step.make_train_superstep trace this exact
    function, so the superstep-equals-per-step guarantee
    (tests/test_train.py::test_superstep_matches_per_step) can never drift
    on key derivation or normalization arithmetic."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    h, w, c = img.shape
    kh, kw = jax.random.split(key)
    tops = jax.random.randint(kh, (batch,), 0, h - crop + 1)
    lefts = jax.random.randint(kw, (batch,), 0, w - crop + 1)

    def get(t, l):
        return lax.dynamic_slice(img, (t, l, 0), (crop, crop, c))

    crops = jax.vmap(get)(tops, lefts)
    return crops.astype(jnp.float32) / 127.5 - 1.0


def broadcast_norm_body(img, batch: int):
    """In-jit center-crop batch (no random_crop): normalize + broadcast."""
    import jax.numpy as jnp

    x = img.astype(jnp.float32) / 127.5 - 1.0
    return jnp.broadcast_to(x, (batch,) + x.shape)


def sample_multi_crops_body(imgs, h_valid, w_valid, key, crop: int, batch: int):
    """In-jit multi-image random-crop batch: (N, Hp, Wp, C) uint8 (padded
    stack, :meth:`MultipleImagesDataset.stacked_images`) -> (batch, crop,
    crop, C) float32 in [-1, 1]. Per batch element an (image index, top,
    left) triple is drawn — tops/lefts bounded by THAT image's valid extent
    (jax.random.randint broadcasts per-element maxval), so zero padding is
    never sampled. Reference semantics: a random file choice + RandomCrop +
    ToTensor + Normalize(0.5) per sample (datasets_classes.py:85-128).

    THE single copy of the multi-image sample body — both
    DeviceMultiImageSampler (per-step path) and train_step.
    make_train_superstep trace this exact function (same guarantee as
    :func:`sample_crops_body`)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n, _, _, c = imgs.shape
    ki, kh, kw = jax.random.split(key, 3)
    idx = jax.random.randint(ki, (batch,), 0, n)
    tops = jax.random.randint(kh, (batch,), 0, h_valid[idx] - crop + 1)
    lefts = jax.random.randint(kw, (batch,), 0, w_valid[idx] - crop + 1)

    def get(i, t, l):
        return lax.dynamic_slice(imgs, (i, t, l, 0), (1, crop, crop, c))[0]

    crops = jax.vmap(get)(idx, tops, lefts)
    return crops.astype(jnp.float32) / 127.5 - 1.0


def pick_images_body(imgs, key, batch: int):
    """In-jit multi-image batch WITHOUT a random crop (center-crop/resize
    datasets, where preprocessing already equalized every image): a random
    image index per batch element, gathered + normalized on device."""
    import jax
    import jax.numpy as jnp

    idx = jax.random.randint(key, (batch,), 0, imgs.shape[0])
    return imgs[idx].astype(jnp.float32) / 127.5 - 1.0


def _make_device_samplers(out_sharding=None):
    import functools

    import jax

    jit_kw = {} if out_sharding is None else {"out_shardings": out_sharding}
    sample_crops = functools.partial(
        jax.jit, static_argnames=("crop", "batch"), **jit_kw
    )(sample_crops_body)
    broadcast_norm = functools.partial(
        jax.jit, static_argnames=("batch",), **jit_kw
    )(broadcast_norm_body)
    sample_multi = functools.partial(
        jax.jit, static_argnames=("crop", "batch"), **jit_kw
    )(sample_multi_crops_body)
    pick_images = functools.partial(
        jax.jit, static_argnames=("batch",), **jit_kw
    )(pick_images_body)
    return sample_crops, broadcast_norm, sample_multi, pick_images


@functools.lru_cache(maxsize=8)
def _device_samplers(out_sharding=None):
    """Jitted samplers per output sharding (cached — per-call jit closures
    recompile every call; NamedSharding is hashable)."""
    return _make_device_samplers(out_sharding)


class Prefetcher:
    """Background thread that keeps a small queue of device-resident batches
    so the host crop sampling overlaps device compute."""

    def __init__(self, dataset, batch_size: int, steps: int, seed: int, depth: int = 2,
                 device_put=None):
        import jax

        self.dataset = dataset
        self.batch_size = batch_size
        self.steps = steps
        self.rng = np.random.default_rng(seed)
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.device_put = device_put or jax.device_put
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _put(self, item) -> bool:
        """Bounded put that gives up when the consumer abandoned iteration
        (close() / GC) — the worker must never block forever on a full
        queue."""
        while not self._stop.is_set():
            try:
                self.q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        for _ in range(self.steps):
            if self._stop.is_set():
                return
            batch = self.dataset.sample_batch(self.rng, self.batch_size)
            if not self._put(self.device_put(batch)):
                return
        self._put(None)

    def close(self) -> None:
        """Stop the worker thread (safe to call mid-iteration)."""
        self._stop.set()
        try:  # unblock a worker waiting on a full queue
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # pragma: no cover - GC timing
        self._stop.set()

    def __iter__(self) -> Iterator:
        try:
            while True:
                item = self.q.get()
                if item is None:
                    return
                yield item
        finally:
            self.close()


def prepare_data(args):
    """Dataset factory (reference utils.py:158-191)."""
    resize = None
    if args.resize_h is not None or args.resize_w is not None:
        resize = (args.resize_h, args.resize_w)
    if args.data == "single_image":
        return SingleImageDataset(
            path=args.data_path,
            ext=args.data_ext,
            sampling=args.sampling,
            random_crop=args.random_crop,
            center_crop=args.center_crop,
        )
    if args.data == "multiple_images":
        return MultipleImagesDataset(
            path=args.data_path,
            ext=args.data_ext,
            sampling=args.sampling,
            random_crop=args.random_crop,
            center_crop=args.center_crop,
            resize=resize,
        )
    raise ValueError(f"no data named: {args.data}")
