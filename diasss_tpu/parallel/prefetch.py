"""Pipeline parallelism (PP): overlap host IO/keyframe-build of survey line
k+1 with the on-device work of line k.

The reference executes its stage chain strictly sequentially — load all, build
all frames, match, optimize (/root/reference/src/diasss2.cpp:76-101).  On TPU
the natural pipeline is: the *host* parses the next line's XML/txt while the
*device* runs the current line's preprocessing + feature detection — JAX device
dispatch is asynchronous, so the main thread only enqueues work and is free to
consume the producer queue.

Two cooperating pieces:

* :func:`prefetch_iter` — a bounded background-thread producer.  The thunk runs
  pure host work (file parse, numpy assembly); all JAX dispatch stays on the
  consuming thread.  ``depth`` bounds the look-ahead so memory stays O(depth)
  frames (double buffering by default).
* :func:`load_keyframes_pipelined` — the CLI's loading stage built on it: as
  each line's arrays arrive from the producer, the consumer dispatches
  ``build_keyframe`` (normalize/mask/geo device programs) and, when a detector
  config is given, ``detect_features`` — so line k's detection executes on the
  device while line k+1 is still being read from disk.

The same overlap applies online: :meth:`diasss_tpu.online.OnlineSlam.run_stream`
prefetches the next arriving frame while the current solve runs.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

_SENTINEL = object()


def prefetch_iter(thunks: Iterable[Callable[[], object]], depth: int = 2) -> Iterator[object]:
    """Yield ``thunk()`` results with a background producer thread.

    The producer runs at most ``depth`` items ahead of the consumer.  Thunks
    should do host-side work only (IO, numpy); JAX calls belong on the
    consumer side.  An exception in a thunk is re-raised in the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: List[BaseException] = []
    stop = threading.Event()  # set when the consumer abandons the generator

    def _put(item) -> bool:
        # timeout-put so an abandoned consumer (generator closed with a full
        # queue) cannot block the producer forever holding file handles open
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for t in thunks:
                if stop.is_set() or not _put(t()):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
    finally:
        # reached on normal exhaustion AND on early close/throw from the
        # consumer (break or exception in the consuming loop): release the
        # producer promptly instead of leaking it until process exit
        stop.set()
        th.join()
    if err:
        raise err[0]


def load_keyframes_pipelined(
    image_folder: str,
    pose_folder: str,
    altitude_folder: str,
    groundrange_folder: str,
    annotation_folder: str,
    detector_cfg=None,
    use_native: bool = True,
    depth: int = 2,
    host_preprocess: bool = False,
    host_imagery: bool = False,
):
    """Load a survey folder set with IO/compute overlap; returns
    ``(frames, feats_or_None, timings)``.

    Equivalent outputs to ``load_input_data`` + a ``build_keyframe`` loop (+ a
    ``detect_features`` loop when ``detector_cfg`` is given), but the XML/txt
    parse of line k+1 runs in a producer thread while line k's device programs
    execute.  ``timings`` records the pipelined wall plus the summed host-parse
    time for overlap accounting.
    """
    import os

    from ..frame import build_keyframe
    from ..io.loader import _readers, _sorted_files

    read_mat, read_txt = _readers(use_native)
    files = list(
        zip(
            _sorted_files(image_folder),
            _sorted_files(pose_folder),
            _sorted_files(altitude_folder),
            _sorted_files(groundrange_folder),
            _sorted_files(annotation_folder),
        )
    )
    parse_time = [0.0]

    def make_thunk(i, img_f, pose_f, alt_f, gr_f, anno_f):
        def thunk():
            t0 = time.perf_counter()
            out = (
                i,
                read_mat(img_f, "ct_img"),
                read_mat(pose_f, "auv_pose"),
                read_txt(alt_f),
                read_txt(gr_f),
                read_mat(anno_f, "anno_kps"),
            )
            parse_time[0] += time.perf_counter() - t0
            return out

        return thunk

    thunks = [make_thunk(i, *fs) for i, fs in enumerate(files)]

    t_wall = time.perf_counter()
    frames = []
    feats = [] if detector_cfg is not None else None
    for i, img, pose, alt, gr, anno in prefetch_iter(thunks, depth=depth):
        f = build_keyframe(i, img, pose, alt, gr, anno,
                           host_preprocess=host_preprocess,
                           host_imagery=host_imagery)
        frames.append(f)
        if detector_cfg is not None:
            from ..features import detect_features

            # async dispatch: executes while the producer parses the next line
            feats.append(detect_features(f.norm, f.mask, detector_cfg))
    if feats is not None and feats:
        import jax

        jax.block_until_ready(feats[-1].desc)
    timings = {
        "load_pipelined_wall": time.perf_counter() - t_wall,
        "load_host_parse": parse_time[0],
    }
    return frames, feats, timings


def build_keyframes_pipelined(
    line_thunks: Sequence[Callable[[], tuple]],
    detector_cfg=None,
    depth: int = 2,
) -> Tuple[list, Optional[list]]:
    """Generic form: each thunk returns ``(img_id, image, dr_poses, altitudes,
    ground_ranges, annos)`` host arrays; keyframes (and optionally features)
    are dispatched as results stream in."""
    from ..frame import build_keyframe

    frames = []
    feats = [] if detector_cfg is not None else None
    for args in prefetch_iter(line_thunks, depth=depth):
        f = build_keyframe(*args)
        frames.append(f)
        if detector_cfg is not None:
            from ..features import detect_features

            feats.append(detect_features(f.norm, f.mask, detector_cfg))
    return frames, feats
