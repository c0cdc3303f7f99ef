#!/usr/bin/env python3
"""Generates the HDF5-interchange test fixture by driving the REAL
converter (tools/hdf5_to_parquet.py convert()) with an h5py.File-shaped
in-memory store — the only part of the converter that cannot run in this
offline environment is h5py itself, so everything from the layout walk
to the parquet emission is exercised for real.

The store mirrors the reference writer's output quirks deliberately:
  - process metadata attrs placed on a CHUNK group (write/hdf.py:465
    writes through `self._grp`, rebound per event to the chunk group);
  - structured pmu/color/edges dtypes (write/hdf.py:297,336,350);
  - `final` in the masks group; num_pcls/custom attrs on event groups.

Output is committed at src/test/resources/interchange_store and read by
HepInterchangeSpec through graft.hep.HepReader.

    python3 tools/make_interchange_fixture.py [out_dir]
"""
import shutil
import sys

import numpy as np

from hdf5_to_parquet import convert


class FakeNode(dict):
    """h5py Group duck-type: a mapping of children plus an attrs dict."""

    def __init__(self, **attrs):
        super().__init__()
        self.attrs = attrs


PMU_T = np.dtype([("x", "<f8"), ("y", "<f8"), ("z", "<f8"), ("e", "<f8")])
COLOR_T = np.dtype([("color", "<i4"), ("anticolor", "<i4")])
EDGE_T = np.dtype([("src", "<i4"), ("dst", "<i4")])


def event(n, seed):
    """A deterministic n-particle event group."""
    g = FakeNode(num_pcls=np.int64(n), sample=np.float64(seed) / 2,
                 tag=f"evt{seed}")
    g["pmu"] = np.array(
        [(seed + i, i * 0.5, -i, seed + i + 1.0) for i in range(n)], PMU_T)
    g["pdg"] = np.array([11 + i for i in range(n)], "<i4")
    g["status"] = np.array([1] * n, "<i2")
    g["helicity"] = np.array([(-1) ** i for i in range(n)], "<i2")
    g["color"] = np.array([(500 + i, 0) for i in range(n)], COLOR_T)
    g["masks"] = FakeNode()
    g["masks"]["final"] = np.array([i == n - 1 for i in range(n)], "?")
    g["masks"]["sig"] = np.array([i % 2 == 0 for i in range(n)], "?")
    g["edges"] = np.array([(-i, -(i + 1)) for i in range(n)], EDGE_T)
    g["edge_weights"] = np.array([1.0 + i for i in range(n)], "<f8")
    g["custom"] = FakeNode()
    g["custom"]["wts"] = np.array([0.5 * seed, 2.0], "<f8")
    g["custom"]["hits"] = np.array([seed, seed * 10], "<i8")
    g["custom"]["grid"] = np.array([[1.0, 2.0], [3.0, seed]], "<f8")
    return g


def build():
    h5 = FakeNode(layout="heparchy", version="1.0.0",
                  evts_per_chunk=np.int64(2))
    proc = FakeNode(num_evts=np.int64(3))
    h5["higgs"] = proc
    # 3 events, epc=2 -> chunks 0 (evt 0,1) and 1 (evt 2); pad=1
    c0, c1 = FakeNode(), FakeNode()
    proc["evt-set-000000"] = c0
    proc["evt-set-000001"] = c1
    c0["evt-0"] = event(2, seed=0)
    c0["evt-1"] = event(3, seed=1)
    c1["evt-0"] = event(2, seed=2)
    # reference quirk: process metadata lands on the LAST chunk group
    c1.attrs.update(process="p p > h", signal_pdgs=np.array([25], "<i4"),
                    com_e=np.float64(13000.0), e_unit="GeV",
                    in_pcls=np.array([2212, 2212], "<i4"),
                    out_pcls=np.array([25], "<i4"),
                    generator="pythia", run=np.int64(7))
    return h5


def main(out="src/test/resources/interchange_store"):
    shutil.rmtree(out, ignore_errors=True)
    convert(build(), out, compression="snappy")
    print(f"fixture written to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
