#!/usr/bin/env python3
"""Classical TTS toolchain bootstrapper (festival / speech_tools / HTK /
HTS / SPTK / merlin).

Capability parity note for the reference's ``src/install_tts.py`` (378
lines of subprocess configure/make that download ~10 source tarballs and
build the author's feature-extraction environment — SURVEY §2 row 23; the
component is unconnected to the neural path).

This environment has **zero network egress**, so downloading those
tarballs is impossible by design. This tool therefore:
  1. checks which toolchain binaries are already present on PATH,
  2. if tarballs were staged locally (``--tarball-dir``), builds them in
     the reference's dependency order,
  3. otherwise prints exactly what would be fetched and why it cannot be.

The neural pipeline (this framework) has no dependency on any of these —
the same status as in the reference.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

# (tool, binary to check, tarball stem) in the reference's build order
COMPONENTS = [
    ("speech_tools", "ch_wave", "speech_tools-2.4-release"),
    ("festival", "festival", "festival-2.4-release"),
    ("festvox", None, "festvox-2.7.0-release"),
    ("HTK", "HVite", "HTK-3.4.1"),
    ("hts_engine", "hts_engine", "hts_engine_API-1.10"),
    ("SPTK", "mgcep", "SPTK-3.9"),
]


def check_installed():
    status = {}
    for name, binary, _ in COMPONENTS:
        status[name] = bool(binary and shutil.which(binary))
    return status


def build_from_tarballs(tarball_dir: str, prefix: str) -> int:
    built = 0
    for name, _, stem in COMPONENTS:
        tarball = None
        for ext in (".tar.gz", ".tar.bz2", ".tgz"):
            cand = os.path.join(tarball_dir, stem + ext)
            if os.path.exists(cand):
                tarball = cand
                break
        if tarball is None:
            print(f"[skip] {name}: no staged tarball ({stem}.*)")
            continue
        build_dir = os.path.join(prefix, "build", name)
        os.makedirs(build_dir, exist_ok=True)
        print(f"[build] {name} from {tarball}")
        subprocess.run(["tar", "xf", tarball, "-C", build_dir], check=True)
        src_root = next(
            os.path.join(build_dir, d) for d in os.listdir(build_dir)
        )
        if os.path.exists(os.path.join(src_root, "configure")):
            subprocess.run(
                ["./configure", f"--prefix={prefix}"], cwd=src_root, check=True
            )
        subprocess.run(["make", "-j4"], cwd=src_root, check=True)
        subprocess.run(["make", "install"], cwd=src_root, check=False)
        built += 1
    return built


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--tarball-dir", default=None,
                   help="directory with pre-staged source tarballs")
    p.add_argument("--prefix", default=os.path.expanduser("~/tts_tools"))
    args = p.parse_args(argv)

    status = check_installed()
    for name, ok in status.items():
        print(f"{'[ok]  ' if ok else '[miss]'} {name}")

    if args.tarball_dir:
        n = build_from_tarballs(args.tarball_dir, args.prefix)
        print(f"built {n} components into {args.prefix}")
    elif not all(status.values()):
        print(
            "\nNo network egress is available in this environment, so the "
            "missing components cannot be downloaded. Stage their source "
            "tarballs and re-run with --tarball-dir. The neural pipeline "
            "does not require them."
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
