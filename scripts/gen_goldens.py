"""Generate multi-seed reference-binary goldens for new testbed configs.

Protocol matches the round-3 goldens (tests/test_testbed.py docstring):
mechanical ctl modernizations only (jobname, finetune auto), burnin
1000, nsample 6000 (A00: 3 seeds; A01/A10/A11: 2 or 3 seeds), traces
concatenated, gzipped into tests/fixtures/testbed/<n>.mcmc.txt.gz.
Parallel over 3 workers (the box has 4 cores).
"""
import gzip
import os
import re
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor

TESTBED = "/root/reference/test/testbed/small"
FIX = "/root/repo/tests/fixtures/testbed"
BPP = "/tmp/bppbuild/src/bpp"
WORK = "/tmp/goldens"

A00_NEW = [2, 3, 5, 7, 9, 10, 12, 14, 15]
A01_NEW = [18, 19, 20, 21, 22, 23, 26, 27, 30, 33, 38, 41, 45, 48,
           # round-5 completion of the full A01 block (17-48)
           25, 28, 31, 32, 34, 35, 37, 39, 40, 42, 43, 44, 46, 47]
A10_NEW = [50, 52, 55, 59, 63, 69, 73, 82, 90, 97, 105,
           # round-5 spread across the remaining alg0/alg1 x E/- x
           # heredity x locusrate cells
           51, 56, 60, 64, 66, 70, 75, 77, 83, 85, 91, 93, 98, 101,
           106, 109]
A11_NEW = [114, 115, 120, 124, 129, 137, 145, 161,
           117, 121, 125, 130, 133, 138, 141, 146, 149, 153, 157,
           162, 165, 169, 173, 176]
SEEDS_A00 = [12345, 777, 31415]
SEEDS_OTHER = [12345, 777, 31415]     # A01 gates need 3 seeds now


def prep_ctl(n, seed, outdir):
    txt = open(f"{TESTBED}/{n}/data/bpp.ctl").read()
    txt = re.sub(r"(?m)^\s*seed\s*=.*$", f"seed = {seed}", txt)
    txt = re.sub(r"(?m)^\s*outfile\s*=.*$", "jobname = out", txt)
    txt = re.sub(r"(?m)^\s*mcmcfile\s*=.*$", "", txt)
    txt = re.sub(r"(?m)^\s*finetune\s*=.*$", "finetune = 1", txt)
    txt = txt.replace("testbed/small/common-data/",
                      f"{TESTBED}/common-data/")
    txt = re.sub(r"(?m)^\s*burnin\s*=.*$", "burnin = 1000", txt)
    txt = re.sub(r"(?m)^\s*sampfreq\s*=.*$", "sampfreq = 1", txt)
    txt = re.sub(r"(?m)^\s*nsample\s*=.*$", "nsample = 6000", txt)
    with open(f"{outdir}/bpp.ctl", "w") as f:
        f.write(txt)


def run_one(n):
    dst = f"{FIX}/{n}.mcmc.txt.gz"
    if os.path.exists(dst):
        return f"{n}: exists"
    seeds = SEEDS_A00 if n <= 16 else SEEDS_OTHER
    parts = []
    for seed in seeds:
        d = f"{WORK}/{n}_{seed}"
        os.makedirs(d, exist_ok=True)
        prep_ctl(n, seed, d)
        r = subprocess.run([BPP, "--cfile", "bpp.ctl"], cwd=d,
                           capture_output=True, text=True, timeout=3600)
        mcmc = f"{d}/out.mcmc.txt"
        if not os.path.exists(mcmc):
            return f"{n}: FAILED seed {seed} rc={r.returncode} " \
                   f"{r.stdout[-200:]}"
        parts.append(open(mcmc).read())
    # concatenate: keep the first header for TSV traces; A01 traces are
    # newick-per-line with no header
    first = parts[0]
    has_header = first.splitlines()[0].startswith("Gen")
    out = [first]
    for p in parts[1:]:
        lines = p.splitlines(keepends=True)
        out.append("".join(lines[1:] if has_header else lines))
    with gzip.open(dst, "wt") as f:
        f.write("".join(out))
    return f"{n}: ok ({len(seeds)} seeds)"


if __name__ == "__main__":
    todo = A00_NEW + A01_NEW + A10_NEW + A11_NEW
    if len(sys.argv) > 1:
        todo = [int(x) for x in sys.argv[1:]]
    os.makedirs(WORK, exist_ok=True)
    with ProcessPoolExecutor(max_workers=3) as ex:
        for msg in ex.map(run_one, todo):
            print(msg, flush=True)
