#!/usr/bin/env python3
"""Synthesize the sf1 (10x sf0.1) fixture — thin shim over make_sfN.py
(which generalizes the same per-copy construction to any scale rung;
see its docstring for the key-offset / ts-jitter / token-suffix
invariants).

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir]
  defaults: /root/testdata/sf0.1 -> /tmp/sf1
"""
import sys

import make_sfN

if __name__ == "__main__":
    args = sys.argv[1:]
    make_sfN.main(10,
                  args[0] if args else "/root/testdata/sf0.1",
                  args[1] if len(args) > 1 else "/tmp/sf1")
