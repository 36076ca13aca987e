"""ctypes binding for the native topology builder (topology_native.cpp).

Builds the shared library on first use with the system g++ (no pip deps;
pybind11 is intentionally not used — plain C ABI + ctypes). Falls back to the
pure-Python parser transparently if no compiler is available.

Usage::

    from gridcodegenerator_tpu.runtime.native import parse_urdf_native
    topo = parse_urdf_native(urdf_xml_or_path, floating_base=False)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..topology.robot import FixedJoint, Joint, RobotTopology
from ..topology.urdf import make_floating_base

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "topology_native.cpp")
_SO = os.path.join(_HERE, "_topology_native.so")
_lock = threading.Lock()
_lib = None


def build_library(force: bool = False) -> Optional[str]:
    """Compile the shared library; returns its path or None on failure."""
    with _lock:
        if not force and os.path.exists(_SO) and \
                os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
        cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
               _SRC, "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return _SO
        except (OSError, subprocess.CalledProcessError):
            return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = build_library()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.gct_topology_from_urdf.restype = ctypes.c_int
    lib.gct_topology_from_urdf.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_long,
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def parse_urdf_native(source: str, floating_base: bool = False,
                      name: Optional[str] = None) -> RobotTopology:
    """Parse URDF via the C++ builder; raises RuntimeError if unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native topology library unavailable (no g++?)")
    if "<robot" not in source:
        with open(source) as fh:
            xml = fh.read()
    else:
        xml = source
    # extract the robot name cheaply (attribute of the root tag)
    robot_name = name
    if robot_name is None:
        import re
        m = re.search(r'<robot[^>]*\bname\s*=\s*["\']([^"\']+)', xml)
        robot_name = m.group(1) if m else "robot"

    fcap, icap, ncap = 4 * 1024 * 1024, 1024 * 1024, 1024 * 1024
    fbuf = np.zeros(fcap, np.float64)
    ibuf = np.zeros(icap, np.int64)
    names = ctypes.create_string_buffer(ncap)
    fused = ctypes.c_long()
    iused = ctypes.c_long()
    nused = ctypes.c_long()
    rc = lib.gct_topology_from_urdf(
        xml.encode(),
        fbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), fcap,
        ibuf.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), icap,
        names, ncap,
        ctypes.byref(fused), ctypes.byref(iused), ctypes.byref(nused))
    if rc != 0:
        raise RuntimeError(f"native URDF parse failed (rc={rc})")

    n, nf = int(ibuf[0]), int(ibuf[1])
    name_list = names.value.decode().strip("\n").split("\n")
    jnames, fnames = name_list[:n], name_list[n:n + nf]

    base_inertia = fbuf[:36].reshape(6, 6).copy()
    off = 36
    joints, Imats = [], []
    JTYPES = {0: "revolute", 1: "prismatic"}
    for i in range(n):
        Xt = fbuf[off:off + 36].reshape(6, 6).copy(); off += 36
        Tt = fbuf[off:off + 16].reshape(4, 4).copy(); off += 16
        Im = fbuf[off:off + 36].reshape(6, 6).copy(); off += 36
        damping, lo, hi = fbuf[off], fbuf[off + 1], fbuf[off + 2]
        eff, vel = fbuf[off + 3], fbuf[off + 4]; off += 5
        parent, jtype, s_ind = (int(ibuf[2 + 3 * i]), int(ibuf[3 + 3 * i]),
                                int(ibuf[4 + 3 * i]))
        joints.append(Joint(
            name=jnames[i], jid=i, parent_id=parent, jtype=JTYPES[jtype],
            S_ind=s_ind, Xtree=Xt, Ttree=Tt, damping=float(damping),
            limit_lower=float(lo), limit_upper=float(hi),
            effort_limit=float(eff), velocity_limit=float(vel)))
        Imats.append(Im)
    fixed = []
    for k in range(nf):
        Tt = fbuf[off:off + 16].reshape(4, 4).copy(); off += 16
        fixed.append(FixedJoint(
            name=fnames[k], fid=k, parent_jid=int(ibuf[2 + 3 * n + k]),
            Ttree=Tt))

    topo = RobotTopology(
        name=robot_name, joints=joints, Imats=Imats,
        base_inertia=base_inertia, fixed_joints=fixed, floating_base=False)
    if floating_base:
        topo = make_floating_base(topo)
    return topo
