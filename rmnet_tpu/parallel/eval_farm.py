"""Per-device evaluation farm (TPU twin of reference utils/eval_server.py:78-127).

One replica of the model variables lives on each device; host threads pull
videos off a shared queue and run the single-device jitted inference on
"their" device. Replaces thread-per-GPU + .cuda(device) pinning with
jax.device_put placement.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Sequence

import jax


class DeviceFarm:
    """Round-robin work farm over devices.

    Args:
      work_fn: callable(device, device_variables, item) -> result. It should
        call functions jitted with ``device=``-pinned inputs (placement via
        the device_put'd variables is enough for jit to stay on-device).
      variables: model variables to replicate per device.
      devices: defaults to all local devices.
    """

    def __init__(
        self,
        work_fn: Callable[[Any, Any, Any], Any],
        variables: Any = None,
        devices: Optional[Sequence[Any]] = None,
    ):
        self.devices = list(devices if devices is not None else jax.devices())
        self.work_fn = work_fn
        # variables=None: work items carry their own weights (checkpoint
        # farming, reference utils/eval_server.py:249-263) — the farm then
        # only provides device scheduling
        self.replicas = (
            [None] * len(self.devices) if variables is None
            else [jax.device_put(variables, d) for d in self.devices]
        )

    def map(self, items: Sequence[Any]) -> List[Any]:
        """Evaluate items across devices; preserves input order."""
        in_q: "queue.Queue" = queue.Queue()
        for i, item in enumerate(items):
            in_q.put((i, item))
        results: List[Any] = [None] * len(items)
        errors: List[Exception] = []

        def worker(dev_idx: int):
            device = self.devices[dev_idx]
            replica = self.replicas[dev_idx]
            while True:
                try:
                    i, item = in_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    results[i] = self.work_fn(device, replica, item)
                except Exception as ex:  # mirror the reference's skip-video
                    errors.append(ex)    # robustness (eval_server.py:111-114)
                    results[i] = None

        threads = [
            threading.Thread(target=worker, args=(i,), daemon=True)
            for i in range(len(self.devices))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors and all(r is None for r in results):
            raise errors[0]
        return results


class AsyncDeviceFarm:
    """Non-blocking checkpoint farm: persistent per-device worker threads.

    ``DeviceFarm.map`` is a barrier — it joins every worker before
    returning, which makes a polling caller (the eval_server loop) wait for
    the whole batch. The reference instead spawns one thread per checkpoint
    and harvests finished threads on every poll tick
    (utils/eval_server.py:216-263). This class is that capability: one
    long-lived worker thread per device pulls items off a shared queue;
    ``submit`` returns a ``concurrent.futures.Future`` immediately, so a
    slow item on one device never delays scoring of a fast item on another.

    work_fn has the DeviceFarm signature: callable(device, replica, item).
    Worker exceptions resolve the future with result ``None`` (the
    reference's skip-and-continue, utils/eval_server.py:111-114) rather
    than raising, so a bad checkpoint cannot kill the serving loop.
    """

    def __init__(
        self,
        work_fn: Callable[[Any, Any, Any], Any],
        variables: Any = None,
        devices: Optional[Sequence[Any]] = None,
    ):
        self.devices = list(devices if devices is not None else jax.devices())
        self.work_fn = work_fn
        self.replicas = (
            [None] * len(self.devices) if variables is None
            else [jax.device_put(variables, d) for d in self.devices]
        )
        self._in_q: "queue.Queue" = queue.Queue()
        self._stopped = False
        self._threads = [
            threading.Thread(target=self._worker, args=(i,), daemon=True)
            for i in range(len(self.devices))
        ]
        for t in self._threads:
            t.start()

    def _worker(self, dev_idx: int):
        device = self.devices[dev_idx]
        replica = self.replicas[dev_idx]
        while True:
            task = self._in_q.get()
            if task is None:  # shutdown sentinel
                return
            future, item = task
            if not future.set_running_or_notify_cancel():
                continue
            try:
                future.set_result(self.work_fn(device, replica, item))
            except BaseException as ex:
                # BaseException too: an unresolved future would block
                # eval_server's drain loop forever on future.result()
                import logging

                logging.exception("AsyncDeviceFarm worker failed on %r", item)
                future.set_result(None)
                if isinstance(ex, (KeyboardInterrupt, SystemExit)):
                    raise

    def submit(self, item: Any) -> Future:
        """Enqueue an item; returns immediately with a Future."""
        if self._stopped:
            raise RuntimeError("farm is shut down")
        future: Future = Future()
        self._in_q.put((future, item))
        return future

    def shutdown(self, wait: bool = True):
        """Stop workers after the queue drains; idempotent."""
        if self._stopped:
            return
        self._stopped = True
        for _ in self._threads:
            self._in_q.put(None)
        if wait:
            for t in self._threads:
                t.join()
