"""Worker process for the REAL multi-process multihost tests.

Launched as `python multihost_worker.py '<json cfg>'` by
tests/test_multihost_real.py, one OS process per simulated host.  Each
worker forms the process group over a localhost coordinator
(jax.distributed), owns a whitespace-safe shard of the corpus, runs the
global (cross-process) word-engine device program, and writes its local
id stream + metadata for the parent to assert on.

This executes the process_count() > 1 branches of parallel/multihost.py
that single-process tests cannot reach: jax.distributed.initialize, the
process_allgather shape/total agreement, cross-process
make_array_from_process_local_data, and addressable-shard readback.
"""

import json
import sys


def main() -> int:
    cfg = json.loads(sys.argv[1])

    import jax

    # The environment registers a remote-TPU backend and overrides the
    # platform selection; this test runs on the virtual CPU mesh.  The
    # config pin must precede distributed init and any backend use.
    jax.config.update("jax_platforms", "cpu")

    from wordpiece_tpu.parallel.multihost import (
        MultiHostWordEncoder,
        initialize_distributed,
    )

    initialize_distributed(
        coordinator_address=cfg["coord"],
        num_processes=cfg["n_procs"],
        process_id=cfg["pid"],
    )
    assert jax.process_count() == cfg["n_procs"], jax.process_count()
    assert jax.process_index() == cfg["pid"]

    import numpy as np

    from wordpiece_tpu.core.vocab import read_vocab_file

    vocab = read_vocab_file(cfg["vocab"])
    enc = MultiHostWordEncoder(vocab)

    # Scenario 1: encode_file — every process takes its own
    # whitespace-safe shard of the shared corpus file.
    ids, total = enc.encode_file(cfg["corpus"])

    # Scenario 2: deliberately UNEQUAL chunk counts.  Tiny pipeline
    # chunks (identical setting on every process) make process 0's
    # local data span several chunks while process 1's spans one; the
    # allgather-max'd chunk count + lockstep dispatch must keep the
    # collectives aligned (a 0x20-era pipeline would deadlock here).
    enc._inner.PIPELINE_CHUNK = int(cfg["small_chunk"])
    enc._inner.PIPELINE_FIRST = int(cfg["small_chunk"]) // 2
    with open(cfg["uneven"][cfg["pid"]], "rb") as f:
        uneven_local = f.read()
    ids2, total2 = enc.encode_local_bytes(uneven_local)

    np.save(cfg["out"] + f".ids{cfg['pid']}.npy", ids)
    np.save(cfg["out"] + f".ids2_{cfg['pid']}.npy", ids2)
    with open(cfg["out"] + f".meta{cfg['pid']}.json", "w") as f:
        json.dump(
            {
                "total": int(total),
                "total2": int(total2),
                "process_count": jax.process_count(),
                "process_index": jax.process_index(),
                "n_local_devices": len(jax.local_devices()),
                "n_global_devices": len(jax.devices()),
                "backend": jax.default_backend(),
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
