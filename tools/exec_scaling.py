"""True N-vs-4N *executor* scaling sampler (local-cluster mode).

The north rule asks for throughput scaling efficiency >= 0.8 between N
and 4N **executors**. The earlier proxies ran one JVM with N vs 4N task
threads (`local[N]` vs `local[4N]`) — but a 32-thread single JVM is an
artifact no real cluster has: executors are separate 4-16-core JVMs,
each with its own heap, GC, allocator arenas, shuffle file streams and
Python worker pool. Measured on this box (BENCH.md §1e follow-up): in
the same quiet host window, four independent 8-core JVMs sustain ~2.7x
the aggregate throughput of one 32-thread JVM on identical input — the
one-JVM "4N" level is intra-JVM contention, not pipeline scaling.

Spark's `local-cluster[numWorkers, coresPerWorker, memPerWorkerMB]`
master launches REAL separate worker+executor JVMs with the driver as
a separate process — the faithful single-box rendition of an N-executor
cluster (verified: triple output bit-identical to local[N]). Protocol:

  * 4N level ("big"):   one job on  local-cluster[C,N,M]  (C executor
    JVMs x N cores), whole tree pinned to all C*N cores.
  * N level ("dense"):  C independent replicas, each a full job on
    local-cluster[1,N,M] pinned to its own disjoint N-core set — all
    C*N cores active, so per-core LLC/memory-bandwidth conditions are
    IDENTICAL at both levels (the §1d density argument), and the
    process structure is identical too: C executor JVMs of N cores
    either way. The ONLY difference between the levels is whether the
    executors cooperate on one job (shuffle exchange, one driver,
    stragglers) or run four independent jobs — exactly the term that
    transfers to a real N -> 4N cluster.

Per-job efficiency := median(dense replica walls) / (C * T_big).

Usage:
    python tools/exec_scaling.py --servers 800000 \
        --pages /dev/shm/askg-scaling-pages-800000 \
        --cores 8 --copies 4 --pairs 3 \
        --out /root/repo/.scaling_execs_800k.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from scaling import REPO, _load_avg, _steal_ticks, _zip_pkg  # noqa: E402
from quiet_sampler import steal_cores  # noqa: E402


def mem_health(streams: int = 8, mb: int = 256, reps: int = 4) -> float:
    """Median wall of `streams` concurrent pinned numpy int64
    sum-streams (mb MB each, reps passes) — a direct memory-bandwidth
    probe. The hypervisor's throttle episodes do NOT show up as steal
    (measured 2026-08-21: a pair with 1.6%/3.1% steal on both sides
    still ran the 32-core big level 2.7x slower than the same binary
    minutes later), but they multiply this probe's wall by >10x
    (healthy window: 0.12-0.13s at 1 AND 8 streams; BENCH.md §1b
    recorded 29s-class walls for same-shape work in a throttled
    window).
    Gate on this BEFORE each level, not just per pair — windows flip
    within minutes."""
    code = ("import numpy,time\n"
            f"a=numpy.ones({mb * 131072},dtype=numpy.int64)\n"
            "t=time.monotonic();s=0\n"
            f"for _ in range({reps}): s+=a.sum()\n"
            "print(time.monotonic()-t)")
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str((i * 4) % 32), sys.executable, "-c", code],
            stdout=subprocess.PIPE, text=True)
        for i in range(streams)
    ]
    walls = sorted(float(p.communicate()[0]) for p in procs)
    return walls[len(walls) // 2]


def cpu_scale_ratio(secs: float = 4.0) -> float:
    """The HOST's own 8->32-stream ALU scaling: aggregate iterations of
    32 concurrent pinned spin streams / aggregate of 8, each over
    `secs`. On honest hardware this is ~4.0; this VM floats between
    ~2.7 (hypervisor gives ~20 effective cores out of 32 — measured
    2026-08-21, a window where the SAME binary's 32-core wall swung
    94.6s..321.6s with near-zero steal and healthy mem_health) and
    ~3.8+ (the windows behind BENCH.md §1e's 0.83-0.94 pairs, where
    local[32] really ran ~4x a local[8]). No software can measure
    >= 0.8 pipeline efficiency while the host itself caps 8->32 at
    0.7 — gate pair sampling on this ratio and DISCLOSE it per pair."""
    code = ("import time\n"
            f"t=time.monotonic();n=0;x=1\n"
            f"while time.monotonic()-t<{secs}:\n"
            "    for _ in range(100000): x=(x*1103515245+12345)%2147483647\n"
            "    n+=1\n"
            "print(n)")

    def agg(streams: int) -> int:
        procs = [
            subprocess.Popen(
                ["taskset", "-c", str(i % 32), sys.executable, "-c", code],
                stdout=subprocess.PIPE, text=True)
            for i in range(streams)
        ]
        return sum(int(p.communicate()[0]) for p in procs)

    a8 = agg(8)
    a32 = agg(32)
    return a32 / a8 if a8 else 0.0


def _cmd(master: str, cpu_lo: int, cpu_hi: int, servers: int,
         zip_path: str, pages: str, driver_mem: str,
         executor_mem: str) -> list[str]:
    return [
        "taskset", "-c", f"{cpu_lo}-{cpu_hi}",
        "spark-submit", "--master", master,
        "--driver-memory", driver_mem,
        # NB: spark-submit silently DROPS --executor-memory for
        # local-cluster masters (executors launch at the 1024M default;
        # verified via the worker's ExecutorRunner launch command) —
        # the conf form survives into the ResourceProfile.
        "--conf", f"spark.executor.memory={executor_mem}",
        "--py-files", zip_path,
        os.path.join(REPO, "askg_spark", "cli.py"),
        "bench", "--servers", str(servers), "--pages", pages,
    ]


def _parse(out: str) -> dict | None:
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    return json.loads(lines[-1]) if lines else None


def run_big(cores: int, copies: int, servers: int, zip_path: str,
            pages: str, timeout: int, worker_mb: int, driver_mem: str,
            executor_mem: str) -> dict:
    load = _load_avg()
    steal0 = _steal_ticks()
    t0 = time.monotonic()
    master = f"local-cluster[{copies},{cores},{worker_mb}]"
    p = subprocess.run(
        _cmd(master, 0, copies * cores - 1, servers, zip_path, pages,
             driver_mem, executor_mem),
        capture_output=True, text=True, timeout=timeout, cwd=REPO)
    harness_wall = time.monotonic() - t0
    rec = _parse(p.stdout) or {"err": p.stderr[-3000:]}
    rec.update({
        "cmd": "big", "master": master,
        "load_before": load, "load_after": _load_avg(),
        "steal_corepct": round(
            100 * (_steal_ticks() - steal0) * 0.01 / harness_wall, 1),
        "harness_wall": round(harness_wall, 1),
    })
    return rec


def run_dense(cores: int, copies: int, servers: int, zip_path: str,
              pages: str, timeout: int, worker_mb: int, driver_mem: str,
              executor_mem: str) -> dict:
    load = _load_avg()
    steal0 = _steal_ticks()
    t0 = time.monotonic()
    master = f"local-cluster[1,{cores},{worker_mb}]"
    procs = [
        subprocess.Popen(
            _cmd(master, i * cores, (i + 1) * cores - 1, servers,
                 zip_path, pages, driver_mem, executor_mem),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO)
        for i in range(copies)
    ]
    walls, recs, errs = [], [], []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        rec = _parse(out)
        if rec:
            recs.append(rec)
            walls.append(rec["sec"])
        else:
            errs.append(err[-3000:])
    harness_wall = time.monotonic() - t0
    walls.sort()
    med = (walls[len(walls) // 2] if len(walls) % 2
           else 0.5 * (walls[len(walls) // 2 - 1] + walls[len(walls) // 2])
           ) if walls else None
    return {
        "cmd": "dense", "master": master, "copies": copies,
        "walls": walls, "median_wall": round(med, 2) if med else None,
        "ok_copies": len(walls),
        "pages": recs[0]["pages"] if recs else None,
        "triples": recs[0]["triples"] if recs else None,
        "stage_sec": recs[0].get("stage_sec") if recs else None,
        "load_before": load, "load_after": _load_avg(),
        "steal_corepct": round(
            100 * (_steal_ticks() - steal0) * 0.01 / harness_wall, 1),
        "harness_wall": round(harness_wall, 1),
        "errors": errs,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--servers", type=int, required=True)
    ap.add_argument("--pages", type=str, required=True)
    ap.add_argument("--cores", type=int, default=8,
                    help="cores per executor (fixed across levels)")
    ap.add_argument("--copies", type=int, default=4,
                    help="executor count at the 4N level")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=4000)
    ap.add_argument("--steal-gate", type=float, default=0.2)
    ap.add_argument("--load-gate", type=float, default=1.5)
    # 16g executors: the 2M-page extract stage OOMs (exit 52) 8-wide at
    # 11g in a 4-replica dense level (and the big level at 11g survives
    # only sometimes); identical per-executor heap at both levels keeps
    # the comparison fair, total commit 4x(16+6)+overhead < 100 GiB.
    ap.add_argument("--worker-mb", type=int, default=17408)
    ap.add_argument("--driver-mem", type=str, default="6g")
    ap.add_argument("--executor-mem", type=str, default="16g")
    ap.add_argument("--mem-gate", type=float, default=0.5,
                    help="max healthy mem_health() median secs "
                         "(healthy ~0.13; throttled windows >1)")
    ap.add_argument("--cpu-scale-gate", type=float, default=3.4,
                    help="min host 8->32-stream ALU scaling ratio "
                         "(honest 4x hardware ~4.0; this VM floats "
                         "2.7..3.8+ — below the gate the HOST caps "
                         "measurable efficiency under the 0.8 target)")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    zip_path = _zip_pkg()

    def quiet() -> tuple[bool, float, float, float, float]:
        sc = steal_cores()
        load = _load_avg()
        mh = mem_health()
        ok = (sc <= args.steal_gate and load <= args.load_gate
              and mh <= args.mem_gate)
        cr = cpu_scale_ratio() if ok else 0.0
        ok = ok and cr >= args.cpu_scale_gate
        return ok, sc, load, mh, cr

    done = 0
    while done < args.pairs:
        ok, sc, load, mh, cr = quiet()
        if not ok:
            print(f"waiting: steal {sc:.2f} cores, load {load}, "
                  f"mem_health {mh:.2f}s, cpu_scale {cr:.2f}",
                  file=sys.stderr, flush=True)
            time.sleep(45)
            continue
        rec_big = run_big(args.cores, args.copies, args.servers,
                          zip_path, args.pages, args.timeout,
                          args.worker_mb, args.driver_mem,
                          args.executor_mem)
        rec_big["mem_health_before"] = round(mh, 3)
        rec_big["cpu_scale_before"] = round(cr, 2)
        rec_big["mem_health_after"] = round(mem_health(), 3)
        rec_big["cpu_scale_after"] = round(cpu_scale_ratio(), 2)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec_big) + "\n")
        print(f"big[{args.copies}x{args.cores}c]: {rec_big.get('sec')}s "
              f"steal {rec_big['steal_corepct']}% "
              f"mem {rec_big['mem_health_before']:.2f}->"
              f"{rec_big['mem_health_after']:.2f} "
              f"cpu_scale {rec_big['cpu_scale_before']:.2f}->"
              f"{rec_big['cpu_scale_after']:.2f}", flush=True)
        # re-gate between levels: throttle windows flip within minutes,
        # and a pair whose two levels straddle a flip is meaningless
        while True:
            ok, sc, load, mh, cr = quiet()
            if ok:
                break
            print(f"waiting (dense): steal {sc:.2f}, load {load}, "
                  f"mem_health {mh:.2f}s, cpu_scale {cr:.2f}",
                  file=sys.stderr, flush=True)
            time.sleep(45)
        rec_d = run_dense(args.cores, args.copies, args.servers,
                          zip_path, args.pages, args.timeout,
                          args.worker_mb, args.driver_mem,
                          args.executor_mem)
        rec_d["mem_health_before"] = round(mh, 3)
        rec_d["cpu_scale_before"] = round(cr, 2)
        rec_d["mem_health_after"] = round(mem_health(), 3)
        rec_d["cpu_scale_after"] = round(cpu_scale_ratio(), 2)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec_d) + "\n")
        if rec_d["median_wall"] and rec_big.get("sec"):
            eff = rec_d["median_wall"] / (args.copies * rec_big["sec"])
            print(f"dense[{args.copies}x1x{args.cores}c]: walls "
                  f"{rec_d['walls']} steal {rec_d['steal_corepct']}% "
                  f"-> pair efficiency {eff:.3f}", flush=True)
        done += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
