#!/usr/bin/env python
"""Modulate bytes to a .wav file / demodulate bytes from a .wav file —
the CLI analog of the reference demo's real audio endpoints (speaker
output / microphone input, demo/demo.js:403-425).

  python examples/wav_modem.py tx --message "hello" --out hello.wav
  python examples/wav_modem.py rx --in hello.wav
  python examples/wav_modem.py tx --file payload.bin --out p.wav --baud 300
"""

import argparse
import sys

sys.path.insert(0, ".")

from webaudio_modem_tpu.utils.platform import ensure_env_platform  # noqa: E402

ensure_env_platform()

import numpy as np  # noqa: E402

from webaudio_modem_tpu.models.config import FSKConfig  # noqa: E402
from webaudio_modem_tpu.models.fsk import FSKCore  # noqa: E402
from webaudio_modem_tpu.utils.audio_io import read_wav, write_wav  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["tx", "rx"])
    ap.add_argument("--message", default="Hello from the TPU modem!")
    ap.add_argument("--file", default=None)
    ap.add_argument("--in", dest="wav_in", default=None)
    ap.add_argument("--out", dest="wav_out", default="modem.wav")
    ap.add_argument("--baud", type=int, default=1200)
    ap.add_argument("--fmt", choices=["pcm16", "float32"],
                    default="pcm16")
    ap.add_argument("--soft", action="store_true",
                    help="use the soft FEC physical layer instead of "
                         "the hard UART modem (coded frames, "
                         "docs/FEC.md) — decode with --soft too")
    args = ap.parse_args()

    config = FSKConfig(baud_rate=args.baud)
    if args.soft:
        from webaudio_modem_tpu.models import SoftModemCore

        core = SoftModemCore(config)
    else:
        core = FSKCore(config)

    if args.mode == "tx":
        data = (open(args.file, "rb").read() if args.file
                else args.message.encode())
        sig = np.asarray(core.modulate_data(data))
        write_wav(args.wav_out, sig, config.sample_rate, fmt=args.fmt)
        print(f"wrote {args.wav_out}: {len(data)} bytes -> "
              f"{len(sig)} samples ({len(sig) / config.sample_rate:.2f}s "
              f"at {args.baud} baud, {args.fmt})")
        return 0

    if not args.wav_in:
        print("rx needs --in <file.wav>", file=sys.stderr)
        return 2
    samples, rate = read_wav(args.wav_in)
    if rate != config.sample_rate:
        print(f"note: file is {rate} Hz, config expects "
              f"{config.sample_rate} Hz — configure accordingly",
              file=sys.stderr)
    decoded = core.demodulate_data(samples)
    status = core.get_status()
    print(f"decoded {len(decoded)} bytes "
          f"(syncs={status['sync_detections']}): {decoded!r}")
    if args.file:
        open(args.file, "wb").write(decoded)
        print(f"wrote {args.file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
