// Minimal self-test (no npm deps): node bindings/node/test.js
const { version } = require("./index.js");
if (version() !== "0.1.0") throw new Error("version mismatch");
console.log("ok", version());
