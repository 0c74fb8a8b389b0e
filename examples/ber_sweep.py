#!/usr/bin/env python
"""BER-vs-SNR sweep (BASELINE config 2): Bell-202-style 1200 baud over
AWGN, device demodulator vs the golden bit-exact comparator on
identical noise.

  python examples/ber_sweep.py --snrs 30 25 20 15 10 5 --messages 64
"""

import argparse
import sys

sys.path.insert(0, ".")

from webaudio_modem_tpu.utils.platform import ensure_env_platform  # noqa: E402

ensure_env_platform()

from webaudio_modem_tpu.models.config import FSKConfig  # noqa: E402
from webaudio_modem_tpu.sim.ber import (ber_sweep,  # noqa: E402
                                        golden_demodulate)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snrs", type=float, nargs="+",
                    default=[30, 25, 20, 15, 10])
    ap.add_argument("--messages", type=int, default=32)
    ap.add_argument("--golden", action="store_true",
                    help="also run the (slow) golden comparator")
    ap.add_argument("--baud", type=int, default=1200)
    ap.add_argument("--mark", type=float, default=1200.0)
    ap.add_argument("--space", type=float, default=2200.0)
    args = ap.parse_args()

    config = FSKConfig(baud_rate=args.baud, mark_frequency=args.mark,
                       space_frequency=args.space)
    print(f"config: {args.baud} baud, mark {args.mark} / space {args.space}")
    device = ber_sweep(config, args.snrs,
                       messages_per_point=args.messages)
    golden = (ber_sweep(config, args.snrs,
                        messages_per_point=args.messages,
                        demodulate=golden_demodulate(config))
              if args.golden else None)

    hdr = f"{'SNR dB':>8} {'BER(dev)':>12} {'FER(dev)':>10}"
    if golden:
        hdr += f" {'BER(gold)':>12} {'FER(gold)':>10}"
    print(hdr)
    for i, p in enumerate(device):
        row = f"{p.snr_db:>8.1f} {p.ber:>12.5f} {p.fer:>10.3f}"
        if golden:
            row += f" {golden[i].ber:>12.5f} {golden[i].fer:>10.3f}"
        print(row)


if __name__ == "__main__":
    main()
