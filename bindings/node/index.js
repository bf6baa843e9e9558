// Node binding stub, mirroring the reference's sezkp-node crate
// (crates/sezkp-node/src/lib.rs:34-53), which exposes only `version()`
// behind a `node` feature. The framework's native surface is the C ABI
// (sezkp_tpu/native/, sezkp_tpu/ffi.py) plus the Python CLI; this package
// exposes the same version() entry point and a helper that shells out to
// the CLI for the full pipeline.
"use strict";

const { execFileSync } = require("node:child_process");

const VERSION = "0.1.0"; // keep in sync with sezkp_tpu/ffi.py::VERSION

function version() {
  return VERSION;
}

/** Run a sezkp-tpu CLI subcommand (requires python + PYTHONPATH set up). */
function cli(args, opts = {}) {
  return execFileSync("python", ["-m", "sezkp_tpu", ...args], {
    encoding: "utf8",
    ...opts,
  });
}

module.exports = { version, cli };
