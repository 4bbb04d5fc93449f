"""Torch-oracle harness: run the reference's *actual* model code on CPU.

``mmcv_shim`` provides a minimal pure-torch ``mmcv`` API surface;
``loader`` mounts the read-only reference tree (/root/reference) as an
importable ``mmedit`` package without executing its heavyweight package
``__init__`` files. Tests then instantiate the reference classes with
random weights, convert the genuine ``state_dict()`` through our
converters, and assert output equality — proving the layout/name mapping
without needing released checkpoint assets.
"""
