#!/usr/bin/env python3
"""Self-test for the OracleXxh DuckDB macro library (dev tool only).

Extracts the macro prologue from src/main/scala/graft/OracleXxh.scala,
generates ground truth with Spark's own xxhash64 via pyspark, and
asserts the DuckDB macros are bit-exact: string hashes across every
tail length 0..39 plus multi-stripe lengths, hashLong/hashInt for
random values, seed chaining (xxhash64(a, b) = hash(b, hash(a, 42))),
and hashLong under the 0..127 minhash permutation seeds (validated
against a pure-Python XXH64 reference that itself matches Spark).

Run: python3 tools/xxh_selftest.py
"""
import random
import re
import string
import sys

import duckdb

M = (1 << 64) - 1
P1, P2 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F
P3, P4, P5 = 0x165667B19E3779F9, 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5


def rotl(x, n):
    return ((x << n) | (x >> (64 - n))) & M


def rnd(acc, inp):
    return (rotl((acc + inp * P2) & M, 31) * P1) & M


def merge(acc, val):
    acc ^= rnd(0, val)
    return (acc * P1 + P4) & M


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    return h ^ (h >> 32)


def xxh64(data: bytes, seed: int) -> int:
    seed &= M
    n, off = len(data), 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed, (seed - P1) & M]
        while off + 32 <= n:
            for i in range(4):
                v[i] = rnd(v[i], int.from_bytes(
                    data[off + 8 * i:off + 8 * i + 8], 'little'))
            off += 32
        h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12)
             + rotl(v[3], 18)) & M
        for x in v:
            h = merge(h, x)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while off + 8 <= n:
        h ^= rnd(0, int.from_bytes(data[off:off + 8], 'little'))
        h = (rotl(h, 27) * P1 + P4) & M
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off:off + 4], 'little') * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < n:
        h ^= (data[off] * P5) & M
        h = (rotl(h, 11) * P1) & M
        off += 1
    return fmix(h)


def hash_long(v, seed):
    return xxh64((v & M).to_bytes(8, 'little'), seed)


def hash_int(v, seed):
    return xxh64((v & 0xFFFFFFFF).to_bytes(4, 'little'), seed)


def signed(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def prologue():
    src = open('src/main/scala/graft/OracleXxh.scala').read()
    m = re.search(r'val prologue: String =\s*\n"""(.*?)"""', src, re.S)
    assert m, 'prologue not found in OracleXxh.scala'
    return m.group(1)


def main():
    random.seed(7)
    con = duckdb.connect()
    con.execute(prologue())
    bad = 0

    # 1. Spark ground truth for strings (every tail length + stripes)
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master('local[4]')
             .config('spark.ui.enabled', 'false').getOrCreate())
    strs = [''] + [
        ''.join(random.choice(string.ascii_lowercase + ' 0123456789')
                for _ in range(L))
        for L in list(range(1, 40)) + [63, 64, 65, 100, 200, 256]]
    # non-ASCII (round 13: g_bytes emits real UTF-8 bytes, not
    # codepoints): 2/3/4-byte chars, combining sequences, mixed text —
    # padded with ASCII so the BYTE lengths sweep every tail-length
    # class (L%32, L%8, L%4) the stream hash branches on
    non_ascii_alpha = ('é' 'ü' 'ß' 'ñ'            # 2-byte
                       '中' '日' '語' '€' '→'      # 3-byte
                       '\U0001F389' '\U0001F600'  # 4-byte (astral)
                       'é'                  # combining sequence
                       'ab ')
    strs += ['é', '中', '\U0001F389', 'é',
             'héllo wörld', '日本語テキスト', 'mixed 中文 and ascii',
             '🎉🎉🎉🎉', 'café ☕ наука δ']
    strs += [
        ''.join(random.choice(non_ascii_alpha) for _ in range(L))
        for L in list(range(1, 24)) + [40, 64, 100]]
    truth = {r.s: r.h for r in spark.createDataFrame(
        [(s,) for s in strs], ['s'])
        .select('s', F.xxhash64('s').alias('h')).collect()}
    lt = spark.createDataFrame(
        [(v,) for v in [0, 1, -1, 42, 2 ** 63 - 1]], 'v: long').select(
        'v', F.xxhash64('v').alias('h'),
        F.xxhash64(F.lit(3).cast('long'), 'v').alias('h2')).collect()
    spark.stop()

    # one set-based query per family (per-call macro planning is slow)
    con.execute('CREATE TABLE st(s VARCHAR, h BIGINT)')
    con.executemany('INSERT INTO st VALUES (?, ?)',
                    [[s, h] for s, h in truth.items()])
    for s, h, got in con.execute(
            'SELECT s, h, g_xxh_str(s) FROM st').fetchall():
        if got != h:
            bad += 1
            print('STR MISMATCH', repr(s), got, h)

    con.execute('CREATE TABLE lt(v BIGINT, h BIGINT, h2 BIGINT)')
    con.executemany('INSERT INTO lt VALUES (?, ?, ?)',
                    [[r.v, r.h, r.h2] for r in lt])
    rows = con.execute(
        'SELECT v, h, h2, g_sgn(g_xxh_long(v, 42::HUGEINT)) FROM lt'
    ).fetchall()
    for v, h, h2, got in rows:
        if got != h:
            bad += 1
            print('LONG MISMATCH', v, got, h)
        if signed(hash_long(v, hash_long(3, 42))) != h2:
            bad += 1
            print('CHAIN MISMATCH (python ref vs spark)', v)

    # 2. seeded hashLong/hashInt vs the Python reference, set-based
    pairs = [(v, k) for k in range(0, 128, 7)
             for v in [0, 1, -5, 2 ** 62, -(2 ** 62)]]
    con.execute('CREATE TABLE sv(v BIGINT, k INTEGER)')
    con.executemany('INSERT INTO sv VALUES (?, ?)', [list(p) for p in pairs])
    for v, k, got in con.execute(
            'SELECT v, k, g_xxh_long(v, k::HUGEINT) FROM sv').fetchall():
        if int(got) != hash_long(v, k):
            bad += 1
            print('SEEDED LONG MISMATCH', k, v)
    ints = [0, 1, -1, 5, 2 ** 31 - 1, -(2 ** 31)]
    con.execute('CREATE TABLE iv(v INTEGER)')
    con.executemany('INSERT INTO iv VALUES (?)', [[v] for v in ints])
    for v, got in con.execute(
            'SELECT v, g_xxh_int(v, 42::HUGEINT) FROM iv').fetchall():
        if int(got) != hash_int(v, 42):
            bad += 1
            print('INT MISMATCH', v)

    print(f'xxh_selftest: {"OK" if bad == 0 else f"{bad} MISMATCHES"}')
    return 0 if bad == 0 else 1


if __name__ == '__main__':
    sys.exit(main())
