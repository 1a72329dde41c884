# Castor worker: the out-of-process model host graft.pipeline.Castor
# spawns (the reference's services/castor python worker, re-expressed
# stdlib-only). Speaks the documented columnar batch contract over
# stdin/stdout:
#
#   handshake (stdin):  one JSON line {"model": ..., "window": ..., "k": ...}
#   per batch (stdin):  one JSON line {"n": N, "tags": {...}}
#                       N * int64  little-endian  (t, epoch us ascending)
#                       N * float64 little-endian (v)
#   per batch (stdout): one JSON line {"n": N}
#                       N * float64 little-endian (score)
#                       N * uint8                 (flag)
#
# The buffers are exactly Arrow's primitive-array layout (validity
# omitted: the JVM side drops NULL samples before the boundary), so
# swapping this framing for real Arrow IPC is a codec change only.
# stdlib-only on purpose: the worker must run on a bare python3.
import sys
import json
import struct
import array
import math


def read_exact(f, n):
    b = f.read(n)
    if len(b) != n:
        raise EOFError("short read")
    return b


def zscore(v, n, window, k, score, flag):
    # identical op order to Castor.zscoreModel so doubles match bit-for-bit
    for i in range(n):
        lo = max(0, i - window)
        ln = i - lo
        if ln >= 3:
            s = 0.0
            for j in range(lo, i):
                s += v[j]
            mean = s / ln
            ss = 0.0
            for j in range(lo, i):
                d = v[j] - mean
                ss += d * d
            sd = math.sqrt(ss / (ln - 1))
            z = (v[i] - mean) / max(sd, 1e-9)
            score[i] = z
            if abs(z) > k:
                flag[i] = 1


def threshold(v, n, limit, score, flag):
    for i in range(n):
        score[i] = v[i]
        if abs(v[i]) > limit:
            flag[i] = 1


def main():
    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    cfg = json.loads(stdin.readline())
    model = cfg.get("model", "zscore")
    window = int(cfg.get("window", 20))
    k = float(cfg.get("k", 3.0))
    while True:
        line = stdin.readline()
        if not line:
            return  # parent closed the pipe: clean shutdown
        hdr = json.loads(line)
        n = int(hdr["n"])
        t = array.array("q")
        t.frombytes(read_exact(stdin, 8 * n))
        v = array.array("d")
        v.frombytes(read_exact(stdin, 8 * n))
        if sys.byteorder == "big":
            t.byteswap()
            v.byteswap()
        score = array.array("d", bytes(8 * n))
        flag = bytearray(n)
        if model == "threshold":
            threshold(v, n, k, score, flag)
        else:
            zscore(v, n, window, k, score, flag)
        if sys.byteorder == "big":
            score.byteswap()
        stdout.write((json.dumps({"n": n}) + "\n").encode())
        stdout.write(score.tobytes())
        stdout.write(bytes(flag))
        stdout.flush()


if __name__ == "__main__":
    main()
