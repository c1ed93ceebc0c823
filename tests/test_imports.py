"""Every module in the package imports cleanly (catches dangling imports
in rarely-exercised CLIs and helpers)."""

import importlib
import pkgutil

import swat_tpu


def test_all_modules_import():
    failures = []
    for mod in pkgutil.walk_packages(swat_tpu.__path__,
                                     prefix="swat_tpu."):
        if "libcaptionindex" in mod.name or "libswatdecoder" in mod.name:
            continue  # ctypes .so files, not python modules
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_entrypoints_import():
    import __graft_entry__  # noqa: F401
    import bench  # noqa: F401
    import bench_retrieval  # noqa: F401
