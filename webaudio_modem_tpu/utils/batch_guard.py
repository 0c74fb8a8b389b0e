"""Construction-time guard for the measured batch-shape perf cliffs.

docs/PERFORMANCE.md (batch-size ladder): the Pallas sequential kernels
need ``B % 128 == 0 and B >= 1024`` (ops/pallas/fsk_seq.available) —
other farm batches fall back to the lax path (~2.3x) — and
non-power-of-two sublane row counts are catastrophically slow even on
the Pallas path (B=1536 = 12 half-filled VREG rows measured 123k
channels vs 260k+ at 2048).  Silently accepting such a batch makes the
falloff discoverable only by profiling, so ``ModemFarm`` and the farm
hubs warn once per shape at construction — the same pattern as the
framing kernel's MAX_SLOTS fallback log (pallas/fsk_framing.py).
"""

from __future__ import annotations

_logged: set = set()


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def check_batch_shape(batch: int, who: str) -> None:
    """Warn (once per (batch, who)) when ``batch`` sits on a measured
    TPU perf cliff.  Farm-scale only: batches < 1024 never use the
    Pallas kernels and are test/dev scale, so they stay silent."""
    if batch < 1024 or (batch, who) in _logged:
        return
    from webaudio_modem_tpu.utils.trace import component_logger, metrics

    msg = None
    if batch % 128 != 0:
        msg = (f"{who}(batch={batch}): B % 128 != 0 — the Pallas "
               "sequential kernels are unavailable at this shape and "
               "the farm runs the lax fallback (~2.3x slower, "
               "docs/PERFORMANCE.md batch ladder); round the batch to "
               "a multiple of 128")
    elif not _is_pow2(batch // 128):
        msg = (f"{who}(batch={batch}): non-power-of-two sublane row "
               f"count ({batch // 128} rows of 128) half-fills VREG "
               "tiles — measured catastrophically slow (B=1536: 123k "
               "channels vs 260k+ at B=2048, docs/PERFORMANCE.md); "
               "use a power-of-two batch")
    if msg is not None:
        _logged.add((batch, who))
        metrics.incr("farm.batch_shape_warn")
        component_logger("batch_guard").warning(msg)
