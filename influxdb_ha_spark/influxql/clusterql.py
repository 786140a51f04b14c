"""clusterql — the reference's management mini-language (SURVEY §2.12).

Grammar from service/clusterql/language.go:5-69 (token-trie) and the
admin detection regex of service/admin.go:16-22:

    SHOW PARTITION KEYS [ON db]
    CREATE PARTITION KEY tag[.tag...] ON db[.measurement]
    DROP PARTITION KEY ON db[.measurement]
    SHOW NODES
    REMOVE NODE name
    SET REPLICATION FACTOR n [ON db[.measurement]]

Plus the two statements the reference sketched but left as commented-out
grammar (language.go:52-63), implemented here for completeness:

    UPDATE PARTITION KEY tag[.tag...] ON db[.measurement]
        -- "practically what drop partition key does as well. All data
        -- need to be downloaded and the partition key tag updated before
        -- saving the data in its new position" (language.go:52-55); in
        -- Spark that data movement is rebalance_measurement's
        -- repartition + hive rewrite.
    SHOW REPLICATION FACTORS      (also the comment's "REPLICATIONS")
    BACKUP * TO <path>            (language.go:67: "BACKUP * TO
        -- s3://my-bucket/ (requires aws keys to be setup on every
        -- node)"; here a distributed Parquet export job — also accepts
        -- BACKUP db[.measurement] TO <path> for a scoped backup)

Statements parse to small dataclasses; execution lives in admin.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# admin.go:16-22 — detect management statements before InfluxQL parsing
# (+ UPDATE / REPLICATIONS for the commented-out grammar implemented here)
ADMIN_RE = re.compile(
    r"^\s*(?:(REMOVE|SHOW|DROP|CREATE|SET|UPDATE)"
    r"\s+(NODES|NODE|PARTITION|REPLICATIONS?)"
    r"|BACKUP\s)",
    re.IGNORECASE)


def is_admin_statement(q: str) -> bool:
    return ADMIN_RE.match(q) is not None


@dataclass
class ShowPartitionKeys:
    database: str | None = None


@dataclass
class CreatePartitionKey:
    database: str
    measurement: str  # "" = database-level
    tags: list[str] = None


@dataclass
class DropPartitionKey:
    database: str
    measurement: str = ""


@dataclass
class ShowNodes:
    pass


@dataclass
class RemoveNode:
    name: str


@dataclass
class SetReplicationFactor:
    factor: int
    database: str | None = None
    measurement: str = ""


@dataclass
class UpdatePartitionKey:
    database: str
    measurement: str  # "" = database-level
    tags: list[str] = None


@dataclass
class ShowReplicationFactors:
    pass


@dataclass
class Backup:
    """BACKUP * TO <path> (language.go:67, commented-out grammar).

    database is None for the `*` form (back up everything);
    measurement "" means every measurement in the database."""

    destination: str
    database: str | None = None
    measurement: str = ""


class ClusterQLError(Exception):
    """Parse error; message format mirrors clusterql/parser_test.go goldens
    (e.g. 'error parsing query: unexpected end of statement, expecting KEY')."""


def _split_target(target: str) -> tuple[str, str]:
    if "." in target:
        db, _, m = target.partition(".")
        return db, m
    return target, ""


def parse_clusterql(q: str):
    toks = q.strip().rstrip(";").split()
    if not toks:
        raise ClusterQLError("error parsing query: empty statement")
    up = [t.upper() for t in toks]

    def expect(i: int, word: str):
        if i >= len(toks):
            raise ClusterQLError(
                f"error parsing query: unexpected end of statement, "
                f"expecting {word}")
        if up[i] != word:
            raise ClusterQLError(
                f"error parsing query: found {toks[i]}, expecting {word}")

    if up[0] == "SHOW":
        if len(up) > 1 and up[1] == "NODES":
            return ShowNodes()
        if len(up) > 1 and up[1] in ("REPLICATION", "REPLICATIONS"):
            expect(2, "FACTORS")
            return ShowReplicationFactors()
        expect(1, "PARTITION")
        expect(2, "KEYS")
        db = None
        if len(toks) > 3:
            expect(3, "ON")
            if len(toks) < 5:
                raise ClusterQLError(
                    "error parsing query: unexpected end of statement, "
                    "expecting database name")
            db = toks[4]
        return ShowPartitionKeys(database=db)

    if up[0] in ("CREATE", "UPDATE"):
        expect(1, "PARTITION")
        expect(2, "KEY")
        if len(toks) < 4:
            raise ClusterQLError(
                "error parsing query: unexpected end of statement, "
                "expecting tags")
        tags = toks[3].split(".")
        expect(4, "ON")
        if len(toks) < 6:
            raise ClusterQLError(
                "error parsing query: unexpected end of statement, "
                "expecting database name")
        db, m = _split_target(toks[5])
        cls = CreatePartitionKey if up[0] == "CREATE" else UpdatePartitionKey
        return cls(database=db, measurement=m, tags=tags)

    if up[0] == "DROP":
        expect(1, "PARTITION")
        expect(2, "KEY")
        expect(3, "ON")
        if len(toks) < 5:
            raise ClusterQLError(
                "error parsing query: unexpected end of statement, "
                "expecting database name")
        db, m = _split_target(toks[4])
        return DropPartitionKey(database=db, measurement=m)

    if up[0] == "REMOVE":
        expect(1, "NODE")
        if len(toks) < 3:
            raise ClusterQLError(
                "error parsing query: unexpected end of statement, "
                "expecting node name")
        return RemoveNode(name=toks[2])

    if up[0] == "SET":
        expect(1, "REPLICATION")
        expect(2, "FACTOR")
        if len(toks) < 4 or not toks[3].isdigit():
            raise ClusterQLError(
                "error parsing query: expecting replication factor")
        db = None
        m = ""
        if len(toks) > 4:
            expect(4, "ON")
            db, m = _split_target(toks[5])
        return SetReplicationFactor(factor=int(toks[3]), database=db,
                                    measurement=m)

    if up[0] == "BACKUP":
        if len(toks) < 2:
            raise ClusterQLError(
                "error parsing query: unexpected end of statement, "
                "expecting backup target")
        expect(2, "TO")
        if len(toks) < 4:
            raise ClusterQLError(
                "error parsing query: unexpected end of statement, "
                "expecting destination path")
        if toks[1] == "*":
            db, m = None, ""
        else:
            db, m = _split_target(toks[1])
        return Backup(destination=toks[3], database=db, measurement=m)

    raise ClusterQLError(f"error parsing query: unsupported statement {toks[0]}")
