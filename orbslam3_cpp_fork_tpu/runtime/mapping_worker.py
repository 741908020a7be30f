"""Background mapping/loop-closing stage — the pipeline analog of the
reference's LocalMapping + LoopClosing threads (src/System.cc:217,244).

The reference's concurrency model is a 4-thread pipeline with
producer-consumer keyframe queues, back-pressure (Tracking inserts KFs
only when LocalMapping is idle or its queue is short,
src/Tracking.cc:3046-3063) and cooperative BA interruption
(LocalMapping::InterruptBA, src/LocalMapping.cc:136). Here the same
shape is one host thread consuming a bounded keyframe queue and running
the tracker's mapping step (triangulate -> fuse -> cull -> local BA ->
IMU ladder -> place recognition); tracking keeps the critical path and
reads a bounded-stale map under a shared RLock whose critical sections
are the short numpy gathers/write-backs (device compute runs outside
the lock, overlapped by JAX async dispatch).

Concurrency contract (mirrors the reference's lock inventory, SURVEY
§2.9):
- only this worker mutates map structure (landmark/keyframe creation
  past insertion, culling, BA write-backs, loop corrections);
- the track thread mutates only per-frame bindings and the
  visible/found counters, and inserts keyframe rows under the lock;
- cross-thread effects on live tracking state (pose rebase after a
  loop/global correction, Atlas merges) are handed back to the track
  thread: corrections bump Map.big_change_idx which the tracker
  consumes at the next frame (the Tracking.cc:1857 map-change rebase),
  and merge proposals are parked in `pending_merge` for the track
  thread to execute.
"""

from __future__ import annotations

import logging
import queue
import threading

log = logging.getLogger("orbslam3_tpu.mapping")


class LoopWorker:
    """Dedicated place-recognition stage — the reference's LoopClosing
    THREAD (src/System.cc:244, LoopClosing::Run :110): consumes every
    keyframe the mapping stage finishes and runs detection, validation
    and correction without blocking the mapping worker. Detection is
    never skipped; the queue is drained keyframe by keyframe exactly
    like the reference's loop (:110-126)."""

    def __init__(self, tracker):
        self.tracker = tracker
        self.q: queue.Queue = queue.Queue()
        self.idle = threading.Event()
        self.idle.set()
        self.error: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, name="loop_closing", daemon=True
        )
        self._thread.start()

    def submit(self, k: int, map_ref):
        self.idle.clear()
        self.q.put((k, map_ref))

    def busy(self) -> bool:
        return not (self.idle.is_set() and self.q.empty())

    def flush(self):
        self.q.join()
        self.idle.wait()
        if self.error is not None:
            err, self.error = self.error, None
            raise err

    def stop(self):
        self.flush()
        self.q.put(None)
        self._thread.join(timeout=30)

    def _run(self):
        while True:
            item = self.q.get()
            if item is None:
                self.q.task_done()
                return
            k, map_ref = item
            try:
                self.tracker._loop_step(k, map_ref)
            except BaseException as e:  # surface at the next flush
                log.exception("loop step failed for KF %d", k)
                self.error = e
            finally:
                self.q.task_done()
                if self.q.empty():
                    self.idle.set()


class MappingWorker:
    """Consumes keyframe slots; runs Tracker._mapping_step on each."""

    def __init__(self, tracker, max_queue: int = 3):
        self.tracker = tracker
        self.max_queue = max_queue
        self.q: queue.Queue = queue.Queue()
        self.idle = threading.Event()
        self.idle.set()
        # Set by Tracker._mapping_step once the MAP FRONTIER of the
        # step being processed is fresh (triangulations + fusion +
        # landmark culling landed); the window-BA polish and loop
        # handoff may still be in flight. wait_idle() returns at this
        # point: tracking wants the frontier (its matches live there),
        # while the BA pose polish can land concurrently a few frames
        # late without starving it (the reference's InterruptBA makes
        # the same call — BA is the deferrable stage,
        # src/LocalMapping.cc:136-241).
        self.frontier = threading.Event()
        self.frontier.set()
        self.error: BaseException | None = None
        self.n_processed = 0
        # Bumped by the tracker at each step's frontier point — the
        # local-map snapshot version key includes it so tracking
        # rebuilds its device snapshot as soon as fresh frontier
        # geometry exists, not only at step completion.
        self.n_frontier = 0
        self._thread = threading.Thread(
            target=self._run, name="mapping", daemon=True
        )
        self._thread.start()

    # -- producer side (track thread) ----------------------------------

    def accepting(self) -> bool:
        """Back-pressure policy: accept a new keyframe when idle or the
        queue is short (src/Tracking.cc:3046-3063)."""
        return self.q.qsize() < self.max_queue

    def busy(self) -> bool:
        return not (self.idle.is_set() and self.q.empty())

    def submit(self, k: int, payload: dict):
        self.idle.clear()
        self.frontier.clear()
        self.q.put((k, payload))

    def flush(self):
        """Block until every queued keyframe is fully processed (used by
        trajectory export, checkpointing, shutdown)."""
        self.q.join()
        self.idle.wait()
        if self.error is not None:
            err, self.error = self.error, None
            raise err

    def wait_idle(self, timeout: float) -> bool:
        """Bounded-staleness wait: block up to `timeout` seconds for the
        in-flight mapping work's MAP FRONTIER to land (see `frontier`;
        full idle also qualifies), returning whether it did. The track
        thread calls this each frame (see
        TrackerConfig.map_wait_budget_ms) — unlike flush() it never
        stalls unboundedly behind a long step, and unlike racing ahead
        it keeps the map frontier the tracker reads from at most one
        bounded step stale."""
        import time

        def ready() -> bool:
            if self.q.empty():
                return self.idle.is_set() or self.frontier.is_set()
            return False

        deadline = time.monotonic() + timeout
        while not ready():
            if time.monotonic() >= deadline:
                return False
            self.frontier.wait(min(0.002, max(deadline - time.monotonic(), 0)))
        if self.error is not None:
            err, self.error = self.error, None
            raise err
        return True

    def stop(self):
        self.flush()
        self.q.put(None)
        self._thread.join(timeout=30)

    # -- consumer side --------------------------------------------------

    def _run(self):
        while True:
            item = self.q.get()
            if item is None:
                self.q.task_done()
                return
            # Drain everything already queued: the frontier of the map
            # must keep pace with the camera, so under backlog the
            # newest keyframe gets the full mapping step (whose
            # triangulation pairs cover the skipped keyframes' features
            # through the covisibility neighborhood) and the older ones
            # are registered only. This bounds map latency to ~one
            # mapping step regardless of queue depth.
            items = [item]
            stop = False
            while True:
                try:
                    nxt = self.q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                items.append(nxt)
            try:
                if len(items) == 1:
                    k, payload = items[0]
                    self.tracker._mapping_step(k, **payload)
                else:
                    self.tracker._mapping_step_batch(
                        [it[0] for it in items], **items[-1][1]
                    )
                self.n_processed += len(items)
            except BaseException as e:  # surface at the next flush
                log.exception(
                    "mapping step failed for KFs %s",
                    [it[0] for it in items],
                )
                self.error = e
            finally:
                for _ in items:
                    self.q.task_done()
                if stop:
                    self.q.task_done()
                    return
                if self.q.empty():
                    self.idle.set()
