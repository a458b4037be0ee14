"""Background vocoding of intermediate training results.

Parity target: reference local/training.py:165-207
(``AsynchronousSynthesisQueue``): turn ``.npy`` LPC-feature dumps into
``.wav`` files without blocking the training loop (the reference burns a
multiprocessing pool of CPU LPCNet instances).

TPU design: one background *thread* drains a job queue and runs the batched,
jitted vocoder — device dispatch is asynchronous, so synthesis overlaps with
host-side training bookkeeping, and one compiled program replaces N
processes.  The API (``add_job(filename)``, ``wait()``) is unchanged.
"""

from __future__ import annotations

import logging
import queue
import threading
from pathlib import Path

import numpy as np

from ..utils.audio import write_wav

logger = logging.getLogger("dss_tpu.train.synth_queue")


class AsynchronousSynthesisQueue:
    def __init__(self, nb_processes: int = 1, backend: str = "dsp",
                 weights=None):
        # nb_processes kept for API compatibility; batching replaces
        # process-parallelism.
        del nb_processes
        self._backend = backend
        self._weights = weights
        self._queue: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self) -> None:
        from ..vocoder import LPCNet

        vocoder = LPCNet(backend=self._backend, weights=self._weights)
        while True:
            item = self._queue.get()
            if item is None:
                self._queue.task_done()
                break
            filename, verbose = item
            try:
                if verbose > 0:
                    logger.info(f"Synthesizing {filename}.")
                lpc = np.load(filename).astype(np.float32)
                vocoder.reset_decoder()
                pcm = vocoder.synthesize_frames(lpc)
                out = Path(filename).with_suffix(".wav").as_posix()
                write_wav(out, pcm, fs=16000)
                if verbose > 0:
                    logger.info(f"Finished synthesizing {filename}.")
            except Exception as e:  # match the reference: swallow per-job
                logger.error(
                    f"Could not synthesize {filename} due to an unexpected "
                    f"exception: {e}"
                )
            finally:
                self._queue.task_done()

    def add_job(self, filename: str, verbose: int = 0) -> None:
        self._queue.put((str(filename), verbose))

    def wait(self) -> None:
        """Block until all queued jobs are finished, then stop the worker."""
        self._queue.put(None)
        self._queue.join()
        self._worker.join()
