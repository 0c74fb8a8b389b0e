"""Observability tests."""

import logging

from webaudio_modem_tpu.utils.trace import (Metrics, component_logger,
                                            metrics, set_debug)


def test_component_logger_tag():
    log = component_logger("FSKProcessor", "sender")
    assert log.extra["tag"] == "[FSKProcessor:sender]"
    log2 = component_logger("XModemTransport")
    assert log2.extra["tag"] == "[XModemTransport]"


def test_set_debug_levels():
    set_debug(True)
    assert logging.getLogger("webaudio_modem_tpu").level == logging.DEBUG
    set_debug(False)
    assert logging.getLogger("webaudio_modem_tpu").level == logging.WARNING


def test_metrics_counters_and_gauges():
    m = Metrics()
    m.incr("packets", 2)
    m.incr("packets")
    m.gauge("channels", 4096)
    snap = m.snapshot()
    assert snap["counters"]["packets"] == 3
    assert snap["gauges"]["channels"] == 4096


def test_metrics_timer():
    m = Metrics()
    with m.timer("step"):
        pass
    snap = m.snapshot()
    assert snap["timings"]["step"]["count"] == 1
    assert snap["timings"]["step"]["total_s"] >= 0


def test_metrics_reset():
    m = Metrics()
    m.incr("x")
    m.reset()
    assert m.snapshot()["counters"] == {}


def test_global_registry_exists():
    metrics.incr("test_global")
    assert metrics.snapshot()["counters"]["test_global"] >= 1
    metrics.reset()
