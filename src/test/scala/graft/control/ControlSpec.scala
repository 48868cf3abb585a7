package graft.control

import org.scalatest.funsuite.AnyFunSuite

/** C2 — configuration from the environment (no Spark needed). */
class ControlSpec extends AnyFunSuite {

  test("CdcConfig.fromEnv: explicit values parse into every field") {
    val cfg = CdcConfig.fromEnv(Map(
      "CDC_STREAM_ID" -> "s1",
      "CDC_FRAMES_DIR" -> "/d/frames",
      "CDC_EVENTS_DIR" -> "/d/events",
      "CDC_STATE_DIR" -> "/d/state",
      "CDC_CHECKPOINT_DIR" -> "/d/chk",
      "CDC_PUBLICATION_TABLES" -> " users , orders ,,",
      "PORT" -> "9090",
      "CDC_WORKER_COUNT" -> "8"))
    assert(cfg == CdcConfig("s1", "/d/frames", "/d/events", "/d/state", "/d/chk",
      Set("users", "orders"), 9090, 8))
  }

  test("CdcConfig.fromEnv: empty environment yields the documented defaults") {
    val cfg = CdcConfig.fromEnv(Map.empty)
    assert(cfg == CdcConfig("graft_cdc", "/tmp/graft/frames", "/tmp/graft/events",
      "/tmp/graft/state", "/tmp/graft/checkpoint", Set("users"), 8080, 32))
  }

  test("CdcConfig.fromEnv: malformed numerics fail loudly, not with a default") {
    intercept[NumberFormatException] {
      CdcConfig.fromEnv(Map("PORT" -> "eighty"))
    }
  }
}
