"""The measured batch-shape perf cliffs must warn at construction
(VERDICT r3 weak #6): B=1536-class non-power-of-two sublane row counts
and B % 128 != 0 fall off the Pallas path — docs/PERFORMANCE.md batch
ladder."""

import logging

from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG
from webaudio_modem_tpu.models.farm import ModemFarm
from webaudio_modem_tpu.utils import batch_guard


def _fresh():
    batch_guard._logged.clear()


def test_non_pow2_sublane_rows_warns(caplog):
    _fresh()
    with caplog.at_level(logging.WARNING):
        ModemFarm(DEFAULT_FSK_CONFIG, 1536)
    assert any("non-power-of-two sublane row count" in r.message
               for r in caplog.records)


def test_non_multiple_of_128_warns(caplog):
    _fresh()
    with caplog.at_level(logging.WARNING):
        ModemFarm(DEFAULT_FSK_CONFIG, 1100)
    assert any("B % 128 != 0" in r.message for r in caplog.records)


def test_good_shapes_and_small_batches_silent(caplog):
    _fresh()
    with caplog.at_level(logging.WARNING):
        ModemFarm(DEFAULT_FSK_CONFIG, 2048)
        ModemFarm(DEFAULT_FSK_CONFIG, 8)     # test scale: never warn
        ModemFarm(DEFAULT_FSK_CONFIG, 12)
    assert not [r for r in caplog.records
                if r.name.endswith("batch_guard")]


def test_warns_once_per_shape(caplog):
    _fresh()
    with caplog.at_level(logging.WARNING):
        ModemFarm(DEFAULT_FSK_CONFIG, 1536)
        ModemFarm(DEFAULT_FSK_CONFIG, 1536)
    hits = [r for r in caplog.records
            if "non-power-of-two" in r.message]
    assert len(hits) == 1


def test_hub_construction_guarded(caplog):
    _fresh()
    from webaudio_modem_tpu.runtime.farm_channel import FarmLoopbackHub
    with caplog.at_level(logging.WARNING):
        FarmLoopbackHub(DEFAULT_FSK_CONFIG, 1152)
    assert any("non-power-of-two sublane row count" in r.message
               for r in caplog.records)


def test_blind_receiver_guarded(caplog):
    _fresh()
    from webaudio_modem_tpu.models.config import FSKParams
    from webaudio_modem_tpu.ops.soft_blind import BlindSoftBatchReceiver

    params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
    with caplog.at_level(logging.WARNING):
        BlindSoftBatchReceiver(params, 1536, 4800, max_payload=8)
    assert any("non-power-of-two sublane row count" in r.message
               for r in caplog.records)
