"""Deploy-path test: the engine runs via spark-submit --py-files.

The north rule's deploy criterion is `spark-submit --py-files` on a
cluster; this test exercises that exact path — `tools/package.py`
builds dist/dexspark.zip, a job script OUTSIDE the repo is submitted
with the repo stripped from PYTHONPATH, so every `import dexspark`
resolves from the archive alone, as it would on a remote executor.
"""

import os
import subprocess
import sys
import textwrap

import pyspark

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    import sys
    import dexspark
    assert "dexspark.zip" in dexspark.__file__, dexspark.__file__
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string
    from dexspark import get_spark
    from dexspark.cdc import apply_changes
    from dexspark.cdc.generator import expected_final_state, gen_change_log
    from dexspark.lake import LakeTable

    work = sys.argv[1]
    spark = get_spark("submit-zip", master="local[4]", shuffle_partitions=4)
    schema = _parse_datatype_string(
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    t = LakeTable.create(spark, work + "/tbl", schema, "conv_id", 8)
    log = gen_change_log(spark, 4000, n_convs=60, n_batches=2).persist()
    for b in range(2):
        apply_changes(
            t, log.filter(F.col("batch_seq") == b), batch_id=f"b{b}"
        )
    got = t.read()
    want = expected_final_state(log)
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    print(f"SUBMIT_ZIP_RESULT rows={got.count()} diff={diff}")
    """
)


def test_spark_submit_py_files_zip(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        import package
    finally:
        sys.path.pop(0)
    zip_path = package.build(str(tmp_path / "dexspark.zip"))

    job = tmp_path / "job.py"
    job.write_text(JOB)
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )

    env = dict(os.environ)
    # the repo must NOT be importable except through the zip
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(job), str(tmp_path / "work"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    line = [l for l in out.splitlines() if "SUBMIT_ZIP_RESULT" in l]
    assert line, out[-4000:]
    assert "diff=0" in line[0] and "rows=" in line[0], line[0]
