import multiprocessing as mp, os, time

def unit(cpu):
    os.sched_setaffinity(0, {cpu})
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return time.time() - t0

if __name__ == "__main__":
    for k in (1, 8, 32):
        with mp.get_context("spawn").Pool(k) as pool:
            walls = sorted(pool.map(unit, range(k)))
        print(f"{k}-way: median {walls[len(walls)//2]:.3f}s  max {walls[-1]:.3f}s")
