"""The protobuf-runtime bootstrap transformWithState depends on
(streaming/pbshim.py): zip contents, idempotence, and the no-op path
when a real protobuf is importable."""

from __future__ import annotations

import zipfile

from stripe_data_pipeline_spark.streaming import pbshim


def test_zip_carries_both_namespaces_and_the_shim():
    if not pbshim.shim_available():
        import pytest

        pytest.skip("no vendor protobuf on this host")
    z = pbshim._build_zip()
    names = set(zipfile.ZipFile(z).namelist())
    # the runtime under BOTH package names (vendored internal imports
    # use cloudsdk.google.protobuf), plus the runtime_version shim the
    # 5.x-generated pyspark code calls at import time
    for prefix in ("google/protobuf/", "cloudsdk/google/protobuf/"):
        assert prefix + "descriptor.py" in names
        assert prefix + "runtime_version.py" in names
        assert prefix + "internal/builder.py" in names
    assert "google/__init__.py" in names
    # built once, cached
    assert pbshim._build_zip() == z


def test_shim_is_importable_and_validates(tmp_path):
    if not pbshim.shim_available():
        import pytest

        pytest.skip("no vendor protobuf on this host")
    import subprocess
    import sys

    z = pbshim._build_zip()
    # a FRESH interpreter with only the zip on sys.path must import
    # the runtime and load pyspark's generated state protocol module
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from google.protobuf import descriptor\n"
        "from google.protobuf.internal import builder\n"
        "from google.protobuf import runtime_version\n"
        "runtime_version.ValidateProtobufRuntimeVersion(1, 2, 3)\n"
        "import pyspark.sql.streaming.proto.StateMessage_pb2 as pb\n"
        "m = pb.StateRequest(); m.SerializeToString()\n"
        "print('OK')\n"
    ) % z
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_ensure_applies_pythonpath_and_is_idempotent(spark):
    ok = pbshim.ensure_protobuf_runtime(spark)
    assert ok  # this host has the vendor tree (or a real protobuf)
    if pbshim.protobuf_available():
        return  # real runtime: nothing to assert about the env
    env1 = spark.sparkContext.environment.get("PYTHONPATH", "")
    assert pbshim._ZIP_CACHE in env1
    pbshim.ensure_protobuf_runtime(spark)
    env2 = spark.sparkContext.environment.get("PYTHONPATH", "")
    assert env1 == env2  # no duplicate path entries


def test_vendor_src_env_override(monkeypatch, tmp_path):
    """PBSHIM_VENDOR_SRC points the shim at any pure-python protobuf
    checkout; a bogus path degrades explicitly (shim_available False),
    never deep in the JVM-launched runner."""
    import importlib

    from stripe_data_pipeline_spark.streaming import pbshim

    monkeypatch.setenv("PBSHIM_VENDOR_SRC", str(tmp_path / "nope"))
    mod = importlib.reload(pbshim)
    try:
        assert mod.shim_available() is False
    finally:
        monkeypatch.delenv("PBSHIM_VENDOR_SRC")
        importlib.reload(pbshim)
