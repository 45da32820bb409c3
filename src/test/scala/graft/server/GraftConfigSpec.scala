package graft.server

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  private def yamlFile(body: String): String = {
    val f = Files.createTempFile("graft-cfg-", ".yaml")
    Files.writeString(f, body)
    f.toString
  }

  test("defaults match the reference (configuration.go:11-25)") {
    val c = GraftConfig.load(None, env = Map.empty)
    assert(c == GraftConfig(enabled = true, root = "", mergeTimeoutS = 10,
      secret = "", allowSaveToHd = true, saveTimeoutS = 1.0, noMerges = false,
      port = 7971, host = "0.0.0.0"))
  }

  test("parses the reference's config_test.yaml shape (legacy quack_pipe section)") {
    // verbatim shape of reference config/config_test.yaml
    val f = yamlFile(
      """quack_pipe:
        |  root: /tmp/data
        |  merge_timeout_s: 10
        |  secret: XXXXXX""".stripMargin)
    val c = GraftConfig.load(Some(f), env = Map.empty)
    assert(c.root == "/tmp/data" && c.mergeTimeoutS == 10 && c.secret == "XXXXXX")
    assert(c.port == 7971 && c.saveTimeoutS == 1.0) // untouched -> defaults
  }

  test("gigapi section + top-level port/host, all value kinds") {
    val f = yamlFile(
      """gigapi:
        |  root: /data
        |  save_timeout_s: 2.5
        |  no_merges: true
        |  allow_save_to_hd: false
        |port: 8080
        |host: 127.0.0.1""".stripMargin)
    val c = GraftConfig.load(Some(f), env = Map.empty)
    assert(c.root == "/data" && c.saveTimeoutS == 2.5 && c.noMerges
      && !c.allowSaveToHd && c.port == 8080 && c.host == "127.0.0.1")
  }

  test("present-but-empty YAML scalar falls back to the default, not \"null\"") {
    val f = yamlFile(
      """gigapi:
        |  root:
        |  secret:""".stripMargin)
    val c = GraftConfig.load(Some(f), env = Map.empty)
    assert(c.root == "" && c.secret == "")
  }

  test("env overrides file (viper AutomaticEnv precedence)") {
    val f = yamlFile("gigapi:\n  root: /from-file\nport: 8080")
    val c = GraftConfig.load(Some(f), env = Map(
      "GIGAPI_ROOT" -> "/from-env",
      "GIGAPI_NO_MERGES" -> "true",
      "GIGAPI_SAVE_TIMEOUT_S" -> "0.25",
      "PORT" -> "9090",
      "HOST" -> "::1"))
    assert(c.root == "/from-env" && c.noMerges && c.saveTimeoutS == 0.25)
    assert(c.port == 9090 && c.host == "::1")
    assert(c.mergeTimeoutS == 10)
  }

  test("retention_s extension key: default off, yaml sets, env wins") {
    assert(GraftConfig.load(None, env = Map.empty).retentionS == 0L)
    val f = yamlFile("gigapi:\n  retention_s: 86400")
    assert(GraftConfig.load(Some(f), env = Map.empty).retentionS == 86400L)
    assert(GraftConfig.load(Some(f),
      env = Map("GIGAPI_RETENTION_S" -> "3600")).retentionS == 3600L)
  }

  test("save_timeout_s = 0 snaps to 1 (configuration.go:51-53)") {
    val f = yamlFile("gigapi:\n  save_timeout_s: 0")
    assert(GraftConfig.load(Some(f), env = Map.empty).saveTimeoutS == 1.0)
    assert(GraftConfig.load(None,
      env = Map("GIGAPI_SAVE_TIMEOUT_S" -> "0")).saveTimeoutS == 1.0)
  }

  test("Go ParseBool surface: 1/t/True accepted, garbage ignored") {
    assert(GraftConfig.parseBool("1").contains(true))
    assert(GraftConfig.parseBool("T").contains(true))
    assert(GraftConfig.parseBool("False").contains(false))
    assert(GraftConfig.parseBool("yes").isEmpty)
    // a non-boolean env value falls through to the file/default
    val c = GraftConfig.load(None, env = Map("GIGAPI_NO_MERGES" -> "yes"))
    assert(!c.noMerges)
  }
}
