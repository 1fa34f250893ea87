#!/usr/bin/env python3
"""Record the OAK-D color stream to H.265 (depthai-sdk gated).

Counterpart of the reference record_oakd.py. Requires the depthai-sdk and a
connected OAK-D camera; exits with a clear message otherwise.

    python record_oakd.py --out recordings/ --fps 30
"""

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="recordings")
    ap.add_argument("--fps", type=float, default=30.0)
    args = ap.parse_args(argv)

    try:
        from depthai_sdk import OakCamera, RecordType
    except ImportError:
        print("depthai-sdk is not installed in this environment; "
              "recording requires an OAK-D camera + SDK.", file=sys.stderr)
        return 1

    with OakCamera() as oak:
        color = oak.create_camera("color", resolution="1080P",
                                  fps=args.fps, encode="H265")
        oak.record([color.out.encoded], args.out, RecordType.VIDEO)
        oak.start(blocking=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
