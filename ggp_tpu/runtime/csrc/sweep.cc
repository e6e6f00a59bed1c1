// sweep.cc — native experiment-sweep executor.
//
// The reference fans its (dataset x split) benchmark grid out with
// joblib.Parallel over Python processes (experiments/regression.py:219-231).
// This is the runtime-native equivalent: a worker pool that executes shell
// commands from a task list with per-task logging, retry, and a summary —
// usable standalone (`ggp-sweep tasks.txt -j 4 --retries 1`) or through the
// ctypes wrapper (ggp_tpu/runtime/sweep.py).
//
// Build: g++ -O3 -std=c++17 -pthread sweep.cc -o ggp-sweep
//   (library mode: -shared -fPIC -DGGP_SWEEP_LIB -o libggp_sweep.so)

#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Task {
  std::string cmd;
  int status = -1;
  double seconds = 0.0;
  int attempts = 0;
};

struct Pool {
  std::vector<Task> tasks;
  std::atomic<size_t> next{0};
  std::mutex io_mu;
  int retries = 0;
  bool quiet = false;

  void worker(int wid) {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= tasks.size()) return;
      Task& t = tasks[i];
      for (int attempt = 0; attempt <= retries; ++attempt) {
        t.attempts = attempt + 1;
        auto t0 = std::chrono::steady_clock::now();
        int rc = std::system(t.cmd.c_str());
        t.seconds = std::chrono::duration<double>(
                        std::chrono::steady_clock::now() - t0)
                        .count();
        t.status = rc;
        {
          std::lock_guard<std::mutex> g(io_mu);
          if (!quiet)
            std::cerr << "[ggp-sweep w" << wid << "] task " << i
                      << (rc == 0 ? " ok " : " FAIL ") << "(" << t.seconds
                      << "s, attempt " << t.attempts << "): " << t.cmd
                      << "\n";
        }
        if (rc == 0) break;
      }
    }
  }
};

int run_pool(std::vector<std::string> cmds, int jobs, int retries,
             bool quiet, double* out_seconds, int* out_status) {
  Pool pool;
  pool.retries = retries;
  pool.quiet = quiet;
  for (auto& c : cmds) pool.tasks.push_back({c});
  if (jobs < 1) jobs = 1;
  std::vector<std::thread> ws;
  for (int w = 0; w < jobs; ++w) ws.emplace_back(&Pool::worker, &pool, w);
  for (auto& w : ws) w.join();
  int failed = 0;
  for (size_t i = 0; i < pool.tasks.size(); ++i) {
    if (out_seconds) out_seconds[i] = pool.tasks[i].seconds;
    if (out_status) out_status[i] = pool.tasks[i].status;
    if (pool.tasks[i].status != 0) ++failed;
  }
  return failed;
}

}  // namespace

extern "C" {

// cmds: array of n C strings. Fills seconds[n], status[n]. Returns #failed.
int ggp_sweep_run(const char** cmds, long n, int jobs, int retries,
                  int quiet, double* seconds, int* status) {
  std::vector<std::string> v;
  v.reserve(n);
  for (long i = 0; i < n; ++i) v.emplace_back(cmds[i]);
  return run_pool(std::move(v), jobs, retries, quiet != 0, seconds, status);
}

}  // extern "C"

#ifndef GGP_SWEEP_LIB
int main(int argc, char** argv) {
  if (argc < 2) {
    std::cerr << "usage: ggp-sweep <taskfile|-> [-j N] [--retries R] [-q]\n"
                 "  taskfile: one shell command per line ('-' = stdin)\n";
    return 2;
  }
  std::string file = argv[1];
  int jobs = static_cast<int>(std::thread::hardware_concurrency());
  int retries = 0;
  bool quiet = false;
  for (int i = 2; i < argc; ++i) {
    if (!strcmp(argv[i], "-j") && i + 1 < argc) jobs = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--retries") && i + 1 < argc)
      retries = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-q")) quiet = true;
  }
  std::vector<std::string> cmds;
  std::string line;
  if (file == "-") {
    while (std::getline(std::cin, line))
      if (!line.empty()) cmds.push_back(line);
  } else {
    std::ifstream f(file);
    if (!f) {
      std::cerr << "ggp-sweep: cannot open " << file << "\n";
      return 2;
    }
    while (std::getline(f, line))
      if (!line.empty()) cmds.push_back(line);
  }
  std::vector<double> secs(cmds.size());
  std::vector<int> status(cmds.size());
  int failed =
      run_pool(cmds, jobs, retries, quiet, secs.data(), status.data());
  double total = 0;
  for (double s : secs) total += s;
  std::cerr << "[ggp-sweep] " << cmds.size() - failed << "/" << cmds.size()
            << " ok, cumulative task time " << total << "s\n";
  return failed == 0 ? 0 : 1;
}
#endif
