"""Cluster deployment: package the engine for ``spark-submit --py-files``.

The reference ships as a library embedded in a JVM app; the Spark-native
analog is a pure-Python zip shipped to every executor with
``--py-files`` (SURVEY.md §6 deployment). The engine is dependency-free
beyond pyspark/pyarrow/pandas/numpy (already on cluster images), so one
zip of the ``sparkschema`` package is the whole deployment artifact.

Example::

    zip_path = build_pyfiles_zip("/tmp/sparkschema.zip")
    print(submit_command("my_job.py", py_files=zip_path,
                         master="yarn", num_executors=1000))
"""

from __future__ import annotations

import os
import pathlib
import zipfile


def build_pyfiles_zip(dest: str) -> str:
    """Write a ``--py-files`` zip of the ``sparkschema`` package.

    Deterministic member order; ``.py`` sources only (no caches, no
    tests) — executors unpack this onto ``sys.path``, so the zip root
    must contain the package directory itself."""
    root = pathlib.Path(__file__).resolve().parent
    dest = os.fspath(dest)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(root.rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            z.write(p, "sparkschema/" + p.relative_to(root).as_posix())
    return dest


def submit_command(app: str, *, py_files: str, master: str = "yarn",
                   deploy_mode: str = "client",
                   num_executors: int | None = None,
                   executor_cores: int | None = None,
                   executor_memory: str | None = None,
                   extra_conf: dict[str, str] | None = None) -> list[str]:
    """The ``spark-submit`` argv for a cluster run of ``app`` with the
    engine shipped via ``--py-files`` — the two-cluster-size scaling
    evidence (BASELINE.md) runs this same command at N and 4N
    executors."""
    cmd = ["spark-submit", "--master", master, "--deploy-mode", deploy_mode,
           "--py-files", py_files]
    if num_executors is not None:
        cmd += ["--num-executors", str(num_executors)]
    if executor_cores is not None:
        cmd += ["--executor-cores", str(executor_cores)]
    if executor_memory is not None:
        cmd += ["--executor-memory", executor_memory]
    for k, v in (extra_conf or {}).items():
        cmd += ["--conf", f"{k}={v}"]
    cmd.append(app)
    return cmd
