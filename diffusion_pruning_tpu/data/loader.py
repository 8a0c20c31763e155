"""Host-side input pipeline: decode → augment → tokenize → fixed-shape batches.

Replaces the reference's HF-datasets `with_transform` + torch DataLoader
stack (trainer.py:190-236, data_utils.py:60-192) with a simple prefetching
host pipeline tuned for TPU feeding:

* static batch shapes always (XLA never retraces): corrupt/missing images
  are *replaced* by resampling, not dropped (the reference emits short or
  empty batches and skips them in the loop — trainer.py:895-896);
* images: resize shorter side → (random|center) crop → optional hflip →
  [-1, 1] float32 NHWC;
* text: any HF-style tokenizer callable for CLIP ids + MPNet ids/mask.

`filter_dataset` reproduces data_utils.py:195-223: caption batches → MPNet →
hypernet → cosine codebook index, returning per-sample expert assignments.
"""
from __future__ import annotations

import threading
import queue as queue_mod
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

try:  # native multithreaded JPEG pipeline (native/decoder.cpp)
    import dpt_native
except ImportError:
    dpt_native = None


_TAR_CACHE: Dict[str, "object"] = {}
_TAR_LOCK = threading.Lock()


def read_image_bytes(path: str) -> bytes:
    """Raw bytes for a plain path or a `shard.tar::member` webdataset spec
    (datasets.load_cc3m_webdataset). Tar handles are cached per shard."""
    if "::" not in path:
        with open(path, "rb") as f:
            return f.read()
    import tarfile
    shard, member = path.split("::", 1)
    with _TAR_LOCK:
        tf = _TAR_CACHE.get(shard)
        if tf is None:
            tf = _TAR_CACHE[shard] = tarfile.open(shard)
        return tf.extractfile(member).read()


def load_and_transform_image(path: str, resolution: int, train: bool,
                             center_crop: bool, random_flip: bool,
                             rng: np.random.RandomState) -> Optional[np.ndarray]:
    """PIL decode + SD preprocessing; None on unreadable files."""
    try:
        import io
        img = Image.open(io.BytesIO(read_image_bytes(path))).convert("RGB")
    except Exception:
        return None
    w, h = img.size
    scale = resolution / min(w, h)
    img = img.resize((max(resolution, round(w * scale)),
                      max(resolution, round(h * scale))), Image.BILINEAR)
    w, h = img.size
    if train and not center_crop:
        x0 = rng.randint(0, w - resolution + 1)
        y0 = rng.randint(0, h - resolution + 1)
    else:
        x0, y0 = (w - resolution) // 2, (h - resolution) // 2
    img = img.crop((x0, y0, x0 + resolution, y0 + resolution))
    arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0  # [-1, 1] NHWC
    if train and random_flip and rng.rand() < 0.5:
        arr = arr[:, ::-1, :]
    return arr


class DataPipeline:
    """Iterator of fixed-shape numpy batches with background prefetch."""

    def __init__(
        self,
        columns: Dict[str, List[str]],          # {'image': paths, 'caption': strs}
        batch_size: int,
        resolution: int = 256,
        tokenize_clip: Optional[Callable[[List[str]], np.ndarray]] = None,
        tokenize_mpnet: Optional[Callable[[List[str]], Dict[str, np.ndarray]]] = None,
        train: bool = True,
        center_crop: bool = False,
        random_flip: bool = True,
        seed: int = 0,
        max_samples: Optional[int] = None,
        prefetch: int = 2,
        use_native: Optional[bool] = None,   # None = auto (if built)
        native_threads: int = 0,             # 0 = hardware concurrency
    ):
        self.images = columns["image"][:max_samples] if max_samples else columns["image"]
        self.captions = columns["caption"][:max_samples] if max_samples else columns["caption"]
        self.batch_size = batch_size
        self.resolution = resolution
        self.tokenize_clip = tokenize_clip
        self.tokenize_mpnet = tokenize_mpnet
        self.train = train
        self.center_crop = center_crop
        self.random_flip = random_flip
        self.seed = seed
        self.prefetch = prefetch
        self.use_native = (dpt_native is not None) if use_native is None else use_native
        self.native_threads = native_threads

    def __len__(self):
        return len(self.images) // self.batch_size

    def _native_decode(self, idxs: List[int], rng: np.random.RandomState):
        """Batch decode through the C++ thread pool. Returns (pixels, idxs)
        with failed entries resolved to None (PIL fallback handles them)."""
        raws = []
        for i in idxs:
            try:
                raws.append(read_image_bytes(self.images[i]))
            except (OSError, KeyError):
                raws.append(b"")
        n = len(idxs)
        if self.train and not self.center_crop:
            fx = rng.rand(n).tolist()
            fy = rng.rand(n).tolist()
        else:
            fx = [0.5] * n
            fy = [0.5] * n
        flips = ((rng.rand(n) < 0.5).astype(np.int64).tolist()
                 if (self.train and self.random_flip) else [0] * n)
        batch, ok = dpt_native.decode_batch(raws, self.resolution, fx, fy,
                                            list(map(int, flips)), self.native_threads)
        return batch, ok.astype(bool)

    def _make_batch(self, idxs: Sequence[int], rng: np.random.RandomState,
                    pool: Sequence[int]) -> Dict[str, np.ndarray]:
        idxs = list(idxs)
        backup = list(pool)
        if self.use_native:
            pixels_arr, ok = self._native_decode(idxs, rng)
            pixels = [pixels_arr[j] if ok[j] else None for j in range(len(idxs))]
        else:
            pixels = [None] * len(idxs)
        caps = [None] * len(idxs)
        for j, i in enumerate(idxs):
            arr = pixels[j]
            if arr is None:
                arr = load_and_transform_image(self.images[i], self.resolution,
                                               self.train, self.center_crop,
                                               self.random_flip, rng)
            # static shapes: resample a replacement instead of dropping
            while arr is None and backup:
                i = backup.pop()
                arr = load_and_transform_image(self.images[i], self.resolution,
                                               self.train, self.center_crop,
                                               self.random_flip, rng)
            if arr is None:
                arr = np.zeros((self.resolution, self.resolution, 3), np.float32)
            pixels[j] = arr
            caps[j] = self.captions[i]
        batch: Dict[str, np.ndarray] = {
            "pixel_values": np.stack(pixels),
            "captions": np.asarray(caps, dtype=object),
        }
        if self.tokenize_clip is not None:
            batch["input_ids"] = self.tokenize_clip(caps)
        if self.tokenize_mpnet is not None:
            batch.update(self.tokenize_mpnet(caps))
        return batch

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.images))
        if self.train:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        return idx

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices(epoch)
        rng = np.random.RandomState(self.seed * 7919 + epoch)
        n = len(idx) // self.batch_size
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()

        def producer():
            for b in range(n):
                sl = idx[b * self.batch_size:(b + 1) * self.batch_size]
                pool = idx[(b + 1) * self.batch_size:(b + 1) * self.batch_size + 64]
                batch = self._make_batch(sl, rng, pool)
                while not abandoned.is_set():  # don't block forever if the
                    try:                        # consumer walked away
                        q.put(batch, timeout=0.5)
                        break
                    except queue_mod.Full:
                        continue
                if abandoned.is_set():
                    return
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                yield item
        finally:
            abandoned.set()


def filter_dataset(
    captions: Sequence[str],
    embed_fn: Callable[[List[str]], np.ndarray],     # captions → MPNet embeddings
    route_fn: Callable[[np.ndarray], np.ndarray],    # embeddings → expert indices
    batch_size: int = 2048,
) -> np.ndarray:
    """Assign every caption to its expert (data_utils.py:195-223)."""
    out = []
    for i in range(0, len(captions), batch_size):
        emb = embed_fn(list(captions[i:i + batch_size]))
        out.append(np.asarray(route_fn(emb)))
    return np.concatenate(out) if out else np.zeros((0,), np.int32)
