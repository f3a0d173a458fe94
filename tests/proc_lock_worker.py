"""Subprocess worker for the CROSS-PROCESS writer-lock stress test
(VERDICT r5 #3). Not a pytest module — spawned by
tests/test_manifest_multiprocess.py via sys.executable.

Loops ``n`` times: acquire the manifest writer lock, read a shared
counter file, sleep a beat (to widen any mutual-exclusion hole), write
counter+1. If two processes ever hold the lock at once, increments are
lost and the parent's final-count assertion fails. Retries on
ConcurrentWriterError (the lock is fail-fast by design) so contention
shows up as retries, not losses.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stripe_data_pipeline_spark.manifest_table import (  # noqa: E402
    ConcurrentWriterError,
    _writer_lock,
)


def main() -> None:
    root, n, stale_sec = sys.argv[1], int(sys.argv[2]), float(sys.argv[3])
    counter = os.path.join(root, "counter.txt")
    done = 0
    while done < n:
        try:
            with _writer_lock(root, stale_sec=stale_sec):
                with open(counter) as f:
                    value = int(f.read())
                time.sleep(0.002)  # widen the race window
                tmp = f"{counter}.tmp-{os.getpid()}"
                with open(tmp, "w") as f:
                    f.write(str(value + 1))
                os.replace(tmp, counter)
            done += 1
        except ConcurrentWriterError:
            time.sleep(0.001)  # fail-fast lock: back off and retry
    print(done)


if __name__ == "__main__":
    main()
