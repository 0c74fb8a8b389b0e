"""One-command on-chip verification (VERDICT r2 next-step #6).

Re-runs, on whatever backend jax selects (the real TPU under axon), the
checks that previously lived only in commit messages and doc prose:

  1. golden differential  — FSKCore decode == GoldenFSK on clean + 25 dB
     noisy signals (bit-exact scalar comparator, SURVEY §6)
  2. pallas vs lax        — identical channels decoded at B=2048 (Pallas
     sequential + compact framing kernels engaged) and B=512 (lax
     fallback path) must produce identical bytes per channel
  3. BER spot parity      — device curve == golden curve (bit_errors and
     frame errors) on identical noise at 2 SNR points
  4. PSK farm decode      — 2048 DBPSK channels decode exactly
  5. mini ARQ endurance   — 64 concurrent XModem sessions over the
     device-resident hub, every payload exact
  6. soft farm decode     — 1024 noisy FEC frames decoded exactly from
     one device-resident [B, T] array (two batched Viterbi calls)
  7. LDPC-body farm       — 512 frames with the pluggable LDPC body
     code decoded exactly (batched min-sum replaces the body Viterbi)
  8. turbo-body farm      — 256 frames with the turbo body code
     (batched max-log-MAP on device)
  9. soft-hub ARQ         — 32 concurrent XModem sessions over the
     soft-FEC wire (SoftFarmHub: scheduled window decodes through the
     fused soft decoder, on-device AWGN), every payload exact
 10. blind-hub ARQ        — the same topology with the fully BLIND
     receive path (BlindSoftFarmHub: streaming sync-scan acquisition,
     lengths from decoded headers, zero playout knowledge at RX)

Prints ONE JSON summary line (pass/fail per check + timings) and exits
non-zero on any failure.  Bounded: sized to finish in a few minutes
through the remote-compile tunnel (repeat runs hit the compile cache).

    python examples/verify_onchip.py            # all checks
    python examples/verify_onchip.py --only ber_parity pallas_vs_lax
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def check_golden_differential():
    from webaudio_modem_tpu.golden import GoldenFSK
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG
    from webaudio_modem_tpu.models.fsk import FSKCore

    core = FSKCore(DEFAULT_FSK_CONFIG)
    golden = GoldenFSK(DEFAULT_FSK_CONFIG)
    rng = np.random.RandomState(11)
    # equal-length payloads: each distinct signal length is a distinct
    # remote compile through the tunnel (~3 min each on a cold cache)
    for data in (b"\x00" * 13, b"Hello, World!", bytes(range(13))):
        sig = core.modulate_data(data)
        if not (core.demodulate_data(sig) == golden.demodulate(sig)
                == data):
            return False, f"clean mismatch for {data!r}"
        core.reset()
        golden.reset()
        power = float(np.mean(np.asarray(sig, np.float64) ** 2))
        amp = np.sqrt(3 * power / (10 ** 2.5))       # 25 dB SNR
        noisy = (np.asarray(sig)
                 + amp * (rng.uniform(size=len(sig)) * 2 - 1)
                 ).astype(np.float32)
        if core.demodulate_data(noisy) != golden.demodulate(noisy):
            return False, f"noisy differential mismatch for {data!r}"
        core.reset()
        golden.reset()
    return True, "3 payloads, clean + 25 dB, byte-identical"


def check_pallas_vs_lax():
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG
    from webaudio_modem_tpu.models.farm import ModemFarm
    from webaudio_modem_tpu.ops.pallas import fsk_seq

    msgs = [bytes([i & 0xFF, (i * 7) & 0xFF, 0x5A]) for i in range(512)]
    out = {}
    for B in (2048, 512):     # Pallas path vs lax fallback
        farm = ModemFarm(DEFAULT_FSK_CONFIG, B, donate=False)
        sig = np.asarray(farm.modulate([msgs[i % 512]
                                        for i in range(B)]))
        out[B] = farm.demodulate(sig)[:512]
    if not fsk_seq.available(2048):
        return False, "Pallas kernel unexpectedly unavailable at B=2048"
    if out[2048] != out[512]:
        bad = sum(1 for a, b in zip(out[2048], out[512]) if a != b)
        return False, f"{bad}/512 channels differ between B=2048/B=512"
    if any(out[512][i] != msgs[i] for i in range(512)):
        bad = sum(1 for i in range(512) if out[512][i] != msgs[i])
        return False, f"{bad}/512 channels decoded wrong payloads"
    return True, "512 channels byte-identical across Pallas/lax paths"


def check_ber_parity(snrs=(-4.0, -6.0)):
    from webaudio_modem_tpu.models.config import FSKConfig
    from webaudio_modem_tpu.sim.ber import ber_parity_report

    # Bell-202 wide deviation: its waterfall sits at -4/-6 dB
    # (docs/BER_RESULTS.md), so both points produce NONZERO error
    # counts — digit-exact parity inside the failure region, not a
    # trivially-clean comparison.
    config = FSKConfig(baud_rate=1200, mark_frequency=1200,
                       space_frequency=2200)
    rep = ber_parity_report(config, list(snrs), messages_per_point=24)
    for d, g in zip(rep["device"], rep["golden"]):
        if (d.bit_errors, d.byte_errors) != (g.bit_errors, g.byte_errors):
            return False, (f"SNR {d.snr_db}: device "
                           f"{d.bit_errors}b/{d.byte_errors}f vs golden "
                           f"{g.bit_errors}b/{g.byte_errors}f")
    detail = ", ".join(
        f"{d.snr_db:g} dB: ber={d.ber:.4f} fer={d.fer:.3f}"
        for d in rep["device"])
    return True, f"device==golden at {detail}"


def check_psk_farm():
    from webaudio_modem_tpu.models.farm import ModemFarm
    from webaudio_modem_tpu.models.psk import PSKConfig

    B = 2048
    farm = ModemFarm(PSKConfig(), B, donate=False)
    msgs = [bytes([i & 0xFF, (i >> 8) & 0xFF, (i * 13) & 0xFF])
            for i in range(B)]
    decoded = farm.demodulate(np.asarray(farm.modulate(msgs)))
    bad = sum(1 for d, m in zip(decoded, msgs) if d != m)
    if bad:
        return False, f"{bad}/{B} PSK channels decoded wrong payloads"
    return True, f"{B}/{B} DBPSK channels exact"


def check_mini_arq(batch=64, payload=11):
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG
    from webaudio_modem_tpu.runtime.device_hub import DeviceFarmHub
    from webaudio_modem_tpu.transports.xmodem import XModemTransport

    async def run():
        hub = DeviceFarmHub(DEFAULT_FSK_CONFIG, batch, quantum=4800,
                            ring_quanta=16)
        senders = [XModemTransport(hub.channel("a", i))
                   for i in range(batch)]
        receivers = [XModemTransport(hub.channel("b", i))
                     for i in range(batch)]
        for t in senders + receivers:
            t.configure({"timeout_ms": 600000})
        payloads = [bytes((i + k) & 0xFF for k in range(payload))
                    for i in range(batch)]
        pump = asyncio.ensure_future(hub.run())
        try:
            recv = [asyncio.ensure_future(r.receive_data())
                    for r in receivers]
            await asyncio.sleep(0)
            await asyncio.gather(*(s.send_data(p)
                                   for s, p in zip(senders, payloads)))
            results = await asyncio.gather(*recv)
        finally:
            hub.stop()
            await pump
        bad = sum(1 for r, p in zip(results, payloads) if r != p)
        retx = sum(s.get_statistics().packets_retransmitted
                   for s in senders)
        return bad, retx, hub.steps

    bad, retx, steps = asyncio.run(run())
    if bad:
        return False, f"{bad}/{batch} ARQ payloads mismatched"
    return True, (f"{batch}/{batch} concurrent ARQ transfers exact "
                  f"({steps} quanta, {retx} retransmits)")


def _soft_farm_run(B, payload, snr_db, key, body_code=None, stride=7):
    """Shared body of the two soft-farm checks: B frames synthesized
    in one dispatch (soft_fsk.encode_frames_batch), AWGN added on
    device, batch-decoded (soft_fsk.decode_frames_batch) — no [B, T]
    array ever crosses the host boundary.  Returns (erasures, wrong):
    CRC-detected decode failures vs silently corrupted payloads.  Any
    ``wrong`` is a pipeline bug at ANY SNR; erasures only matter
    relative to the check's SNR margin."""
    import jax
    import jax.numpy as jnp

    from webaudio_modem_tpu.models.config import (DEFAULT_FSK_CONFIG,
                                                  FSKParams)
    from webaudio_modem_tpu.ops import soft_fsk

    params = FSKParams.from_config(DEFAULT_FSK_CONFIG)
    payloads = [bytes((i * stride + k) & 0xFF for k in range(payload))
                for i in range(B)]
    sigs = soft_fsk.encode_frames_batch(params, payloads,
                                        body_code=body_code)
    power = float(jnp.mean(sigs[0].astype(jnp.float32) ** 2))
    amp = np.sqrt(power / (10 ** (snr_db / 10)))
    noise = jax.random.normal(jax.random.PRNGKey(key), sigs.shape,
                              jnp.float32)
    noisy = (sigs + jnp.float32(amp) * noise).astype(jnp.float32)
    out = soft_fsk.decode_frames_batch(params, noisy, payload,
                                       body_code=body_code)
    erasures = sum(1 for o in out if o is None)
    wrong = sum(1 for o, p in zip(out, payloads)
                if o is not None and o != p)
    return erasures, wrong


def check_soft_farm(B=1024, payload=9, snr_db=7.0):
    """Device-resident batched soft path, TX -> channel -> RX all in
    HBM, every payload decoded exactly by the two-Viterbi batch
    decode.  7 dB leaves backend float margin: at 6 dB the plain
    convolutional path sits on its decode cliff and TPU-vs-CPU
    transcendental ULP differences flip ~2/1024 marginal frames into
    CRC-detected erasures (measured on chip; zero at 7 dB on both)."""
    erasures, wrong = _soft_farm_run(B, payload, snr_db, key=3)
    if wrong:
        return False, (f"{wrong}/{B} soft channels SILENTLY corrupt at "
                       f"{snr_db:g} dB (CRC gate breached)")
    if erasures:
        return False, (f"{erasures}/{B} soft channels erased at "
                       f"{snr_db:g} dB")
    return True, f"{B}/{B} FEC frames exact at {snr_db:g} dB (device)"


def check_soft_farm_long_payload(B=1024, payload=96, snr_db=10.0):
    """The round-5 VMEM gates: a 96-byte payload puts the body trellis
    (T=790) past every legal Viterbi kernel block and the decode
    window (T=72720 samples) past the align kernel's scoped-VMEM
    budget, so BOTH stages must take their lax fallbacks inside the
    fused program — silently-correct gating is the contract (the
    kernels' available(...) returning wrongly True wedged/failed
    compiles; returning wrongly False only costs speed)."""
    erasures, wrong = _soft_farm_run(B, payload, snr_db, key=11)
    if wrong:
        return False, (f"{wrong}/{B} long-payload channels SILENTLY "
                       f"corrupt at {snr_db:g} dB")
    if erasures:
        return False, (f"{erasures}/{B} long-payload channels erased "
                       f"at {snr_db:g} dB")
    return True, (f"{B}/{B} payload-{payload} frames exact at "
                  f"{snr_db:g} dB (lax-fallback trellis + barrel)")


def check_turbo_body_farm(B=256, payload=9, snr_db=8.0):
    """Turbo as the batched body code: one batched max-log-MAP over
    B x n_cw codewords replaces the body Viterbi on device."""
    from webaudio_modem_tpu.ops.turbo import default_code

    code = default_code(K=256)
    erasures, wrong = _soft_farm_run(B, payload, snr_db, key=7,
                                     body_code=code, stride=13)
    if erasures or wrong:
        return False, (f"{erasures + wrong}/{B} turbo-body channels "
                       f"failed at {snr_db:g} dB ({wrong} silent)")
    return True, f"{B}/{B} turbo-body frames exact at {snr_db:g} dB"


def check_ldpc_body_farm(B=512, payload=9, snr_db=8.0):
    """The pluggable LDPC body mode on the batched device path: body
    Viterbi replaced by one batched min-sum over B x n_cw codewords in
    HBM (soft_fsk._batch_body_stage body_code branch)."""
    from webaudio_modem_tpu.ops.ldpc import default_code

    code = default_code(n=648, wc=3, wr=6)
    erasures, wrong = _soft_farm_run(B, payload, snr_db, key=5,
                                     body_code=code, stride=11)
    if erasures or wrong:
        return False, (f"{erasures + wrong}/{B} LDPC-body channels "
                       f"failed at {snr_db:g} dB ({wrong} silent)")
    return True, f"{B}/{B} LDPC-body frames exact at {snr_db:g} dB"


def check_soft_hub_arq(batch=32, payload=11):
    """Farm-scale ARQ over the soft-FEC wire: the FEC memo's receive
    pipeline under the full XModem protocol, wire in HBM, on-device
    noise, decoded frames drained through the C++ deframer."""
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG
    from webaudio_modem_tpu.runtime.soft_hub import SoftFarmHub
    from webaudio_modem_tpu.sim import make_device_awgn
    from webaudio_modem_tpu.transports.xmodem import XModemTransport

    async def run():
        hub = SoftFarmHub(DEFAULT_FSK_CONFIG, batch, quantum=4800,
                          ring_quanta=24,
                          device_channel_fn=make_device_awgn(1e-4))
        senders = [XModemTransport(hub.channel("a", i))
                   for i in range(batch)]
        receivers = [XModemTransport(hub.channel("b", i))
                     for i in range(batch)]
        for t in senders + receivers:
            t.configure({"timeout_ms": 600000})
        payloads = [bytes((i * 3 + k) & 0xFF for k in range(payload))
                    for i in range(batch)]
        pump = asyncio.ensure_future(hub.run())
        try:
            recv = [asyncio.ensure_future(r.receive_data())
                    for r in receivers]
            await asyncio.sleep(0)
            await asyncio.gather(*(s.send_data(p)
                                   for s, p in zip(senders, payloads)))
            results = await asyncio.gather(*recv)
        finally:
            hub.stop()
            await pump
        bad = sum(1 for r, p in zip(results, payloads) if r != p)
        return bad, hub.steps, hub.get_status()["frames_decoded"]

    bad, steps, frames = asyncio.run(run())
    if bad:
        return False, f"{bad}/{batch} soft-wire ARQ payloads mismatched"
    return True, (f"{batch}/{batch} ARQ transfers exact over the "
                  f"soft-FEC wire ({steps} quanta, {frames} frames)")


def check_blind_hub_arq(batch=32, payload=11):
    """Same ARQ-over-the-soft-wire topology as soft_hub_arq, but the
    receive path is fully BLIND (runtime/soft_hub.BlindSoftFarmHub):
    frames are acquired by the per-quantum streaming sync scan and
    payload lengths come from decoded headers — no playout knowledge
    reaches RX (reference acquisition model, fsk.ts:297-315)."""
    from webaudio_modem_tpu.models.config import DEFAULT_FSK_CONFIG
    from webaudio_modem_tpu.runtime.soft_hub import BlindSoftFarmHub
    from webaudio_modem_tpu.sim import make_device_awgn
    from webaudio_modem_tpu.transports.xmodem import XModemTransport

    async def run():
        hub = BlindSoftFarmHub(DEFAULT_FSK_CONFIG, batch, quantum=4800,
                               ring_quanta=24,
                               device_channel_fn=make_device_awgn(1e-4))
        senders = [XModemTransport(hub.channel("a", i))
                   for i in range(batch)]
        receivers = [XModemTransport(hub.channel("b", i))
                     for i in range(batch)]
        for t in senders + receivers:
            t.configure({"timeout_ms": 600000})
        payloads = [bytes((i * 5 + k) & 0xFF for k in range(payload))
                    for i in range(batch)]
        pump = asyncio.ensure_future(hub.run())
        try:
            recv = [asyncio.ensure_future(r.receive_data())
                    for r in receivers]
            await asyncio.sleep(0)
            await asyncio.gather(*(s.send_data(p)
                                   for s, p in zip(senders, payloads)))
            results = await asyncio.gather(*recv)
        finally:
            hub.stop()
            await pump
        return (sum(1 for r, p in zip(results, payloads) if r != p),
                hub.steps)

    bad, steps = asyncio.run(run())
    if bad:
        return False, f"{bad}/{batch} blind-RX ARQ payloads mismatched"
    return True, (f"{batch}/{batch} ARQ transfers exact over the "
                  f"blind soft receive path ({steps} quanta)")


CHECKS = [
    ("golden_differential", check_golden_differential),
    ("pallas_vs_lax", check_pallas_vs_lax),
    ("ber_parity", check_ber_parity),
    ("psk_farm", check_psk_farm),
    ("mini_arq", check_mini_arq),
    ("soft_farm", check_soft_farm),
    ("soft_farm_long_payload", check_soft_farm_long_payload),
    ("ldpc_body_farm", check_ldpc_body_farm),
    ("turbo_body_farm", check_turbo_body_farm),
    ("soft_hub_arq", check_soft_hub_arq),
    ("blind_hub_arq", check_blind_hub_arq),
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of check names to run")
    args = ap.parse_args()

    # honor JAX_PLATFORMS=cpu even though the axon sitecustomize
    # imported jax before us (env alone is ignored at that point)
    from webaudio_modem_tpu.utils.platform import ensure_env_platform
    ensure_env_platform()

    import jax
    # Persistent compile cache ONLY for the (remote-compiled) TPU
    # backend: CPU runs sharing the dir load AOT entries compiled with
    # mismatched machine features (cpu_aot_loader warns of SIGILL), and
    # XLA:CPU cache (de)serialization itself has crashed under load
    # (CLAUDE.md "Suite stability").  Guard on the RESOLVED backend:
    # an unset env on a CPU-only machine still selects cpu.  (On the
    # axon machine this initializes the tunnel backend — which the
    # on-chip checks need anyway.)
    if jax.default_backend() != "cpu":
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/wam_jax_cache")
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass

    known = {name for name, _ in CHECKS}
    unknown = set(args.only or ()) - known
    if unknown:
        ap.error(f"unknown check(s) {sorted(unknown)}; "
                 f"available: {sorted(known)}")

    results = []
    ok_all = True
    for name, fn in CHECKS:
        if args.only and name not in args.only:
            continue
        t0 = time.perf_counter()
        try:
            ok, detail = fn()
        except Exception as e:  # noqa: BLE001 - report, don't crash
            ok, detail = False, f"{type(e).__name__}: {e}"
        dt = time.perf_counter() - t0
        print(f"  [{'PASS' if ok else 'FAIL'}] {name}: {detail} "
              f"({dt:.1f}s)", file=sys.stderr, flush=True)
        results.append({"check": name, "ok": ok, "detail": detail,
                        "seconds": round(dt, 1)})
        ok_all = ok_all and ok
    import jax

    print(json.dumps({"pass": ok_all,
                      "backend": jax.default_backend(),
                      "checks": results}))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
