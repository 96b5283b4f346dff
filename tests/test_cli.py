"""CLI surface smoke tests (list/oracle need no Spark session; query
routes through the same registry the driver uses)."""

from __future__ import annotations

from history_collector_spark.__main__ import main


def test_cli_list_enumerates_registry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) > 200
    names = {l.split("\t")[0] for l in out}
    assert {"account_history", "pipeline_parity", "tpch_q19_disjunctive"} <= names


def test_cli_oracle_prints_sql(capsys):
    assert main(["oracle", "point_lookup"]) == 0
    assert "o_orderkey = 7" in capsys.readouterr().out


def test_cli_oracle_missing_is_error(capsys):
    # embedding_whitening_audit is the one permanent rows-only query
    # (LAPACK eigh trajectories are not SQL-replayable); round 15
    # oracle-ized bpe_encode_corpus so it no longer fits here
    assert main(["oracle", "embedding_whitening_audit"]) == 1
    assert main(["oracle", "does_not_exist"]) == 1


def test_cli_parity_green_and_rows_only_error(capsys, monkeypatch):
    from tests.conftest import TEST_SF_DIR

    # rows-only query has no oracle -> error before any Spark work
    assert main(["parity", "embedding_whitening_audit"]) == 1
    # oracle-bearing query runs the round-6-then-exact gate end to end
    assert main(["parity", "scalar_pack", "--sf-dir", TEST_SF_DIR]) == 0
    assert "PARITY OK: scalar_pack" in capsys.readouterr().out
