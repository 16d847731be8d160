package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** GRANT / REVOKE / SHOW GRANTS + query-time enforcement — the engine-side
  * analogue of the reference's access-control stack (grammar
  * SqlBase.g4:58-66; SPI/security/SystemAccessControl.java:233-253
  * checkCanSelectFromTable / checkCanInsertIntoTable /
  * checkCanDeleteFromTable; privileges SPI/security/Privilege.java:16-18
  * SELECT, DELETE, INSERT, UPDATE; grant records
  * SPI/security/GrantInfo.java).
  *
  * Like the reference, the DEFAULT control is allow-all
  * (security/AllowAllAccessControl.java) — enforcement starts when an
  * identity is set AND enforcement is enabled. Checks walk the PARSED plan
  * (every referenced table name needs SELECT), mirroring how the
  * reference's AccessControlManager is consulted during analysis, before
  * any execution. Grants live in-process: this engine is an embedded
  * library, so the principal store is session-scoped rather than a
  * metastore (deployment-level governance stays external, as COVERAGE.md
  * documents).
  */
final class AccessControl {

  /** (grantee, table) → privileges; value includes grant-option flags. */
  private case class Key(grantee: String, table: String)
  private val grants =
    scala.collection.mutable.Map.empty[Key, scala.collection.mutable.Map[String, Boolean]]

  private var enforcing = false
  private var identity: Option[String] = None

  val ValidPrivileges: Set[String] = Set("SELECT", "INSERT", "DELETE", "UPDATE")

  /** SET SESSION AUTHORIZATION analogue (SPI/security/Identity.java). */
  def setIdentity(user: String): Unit = { identity = Some(user) }
  def currentIdentity: Option[String] = identity

  /** Switch from allow-all to enforcing (AllowAllAccessControl →
    * FileBasedSystemAccessControl posture). */
  def setEnforcing(on: Boolean): Unit = { enforcing = on }

  /** (grantee, table, privilege) → grantor recorded at GRANT time
    * (GrantInfo.getGrantor — the identity issuing the grant). */
  private val grantors =
    scala.collection.mutable.Map.empty[(String, String, String), String]

  /** GRANT <privileges> ON <table> TO <grantee> [WITH GRANT OPTION]. */
  def grant(privileges: Seq[String], table: String, grantee: String,
            withGrantOption: Boolean = false): Unit = {
    val ps = normalize(privileges)
    val m = grants.getOrElseUpdate(Key(grantee, table.toLowerCase),
      scala.collection.mutable.Map.empty)
    ps.foreach { p =>
      m(p) = withGrantOption || m.getOrElse(p, false)
      grantors((grantee, table.toLowerCase, p)) = identity.getOrElse("admin")
    }
  }

  /** REVOKE <privileges> ON <table> FROM <grantee>. */
  def revoke(privileges: Seq[String], table: String, grantee: String): Unit = {
    val ps = normalize(privileges)
    grants.get(Key(grantee, table.toLowerCase)).foreach { m =>
      ps.foreach(m.remove)
    }
    ps.foreach(p => grantors.remove((grantee, table.toLowerCase, p)))
  }

  private def normalize(privileges: Seq[String]): Seq[String] = {
    val ps =
      if (privileges.exists(_.equalsIgnoreCase("ALL"))) ValidPrivileges.toSeq
      else privileges.map(_.toUpperCase)
    ps.foreach(p => require(ValidPrivileges(p), s"unknown privilege: $p"))
    ps.sorted
  }

  /** Every grant on record, in the information_schema.table_privileges row
    * order: (grantor, grantee, table, privilege_type, is_grantable). */
  def allGrants: Seq[(String, String, String, String, Boolean)] =
    (for {
      (Key(g, t), m) <- grants.toSeq
      (p, opt) <- m.toSeq
    } yield (grantors.getOrElse((g, t, p), "admin"), g, t, p, opt))
      .sortBy(r => (r._3, r._2, r._4))

  def hasPrivilege(user: String, table: String, privilege: String): Boolean =
    grants.get(Key(user, table.toLowerCase))
      .exists(_.contains(privilege.toUpperCase))

  /** SHOW GRANTS [ON <table>] in the information_schema.table_privileges
    * shape the reference renders (GrantInfo → grantor, grantee, table_name,
    * privilege_type, is_grantable). */
  def showGrants(spark: SparkSession, table: Option[String] = None,
                 grantee: Option[String] = None): DataFrame = {
    import spark.implicits._
    val rows = for {
      (Key(g, t), m) <- grants.toSeq
      if table.forall(_.equalsIgnoreCase(t)) && grantee.forall(_ == g)
      (p, opt) <- m.toSeq
    } yield (g, t, p, opt)
    rows.sortBy(r => (r._2, r._1, r._3))
      .toDF("grantee", "table_name", "privilege_type", "is_grantable")
  }

  /** Single-table privilege check (checkCanInsertIntoTable /
    * checkCanDeleteFromTable consultation points). */
  def checkTable(table: String, privilege: String): Unit = {
    if (!enforcing) return
    val user = identity.getOrElse(
      throw new SecurityException("Access Denied: no identity set"))
    if (!hasPrivilege(user, table, privilege))
      throw new SecurityException(
        s"Access Denied: Cannot ${privilege.toLowerCase} table $table")
  }

  /** The analysis-time check (AccessControlManager consultation point):
    * every table referenced by the statement needs `privilege` for the
    * current identity. Throws the reference's AccessDeniedException
    * analogue on the first violation. */
  def check(spark: SparkSession, query: String,
            privilege: String = "SELECT"): Unit = {
    if (!enforcing) return
    val user = identity.getOrElse(
      throw new SecurityException("Access Denied: no identity set"))
    referencedTables(spark, query).foreach { t =>
      if (!hasPrivilege(user, t, privilege))
        throw new SecurityException(
          s"Access Denied: Cannot select from table $t")
    }
  }

  /** Table names referenced by a statement, from the PARSED (pre-analysis)
    * plan — view expansion hasn't happened yet, so the check applies to the
    * names the user wrote, as the reference's analyzer-time checks do. */
  def referencedTables(spark: SparkSession, query: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    val plan = spark.sessionState.sqlParser.parsePlan(query)
    plan.collectWithSubqueries {
      case r: UnresolvedRelation => r.multipartIdentifier.last.toLowerCase
    }.distinct
  }
}
