package graft.meta

/** Caller identity for domain-scoped catalog authorization.
  *
  * The reference gates catalog access with PostgreSQL roles and row-level
  * security over the meta tables: users log in with a (user, domain) pair
  * (`DBUtil.usernameKey`/`domainKey` system properties select the login —
  * lakesoul-common/src/main/java/com/dmetasoul/lakesoul/meta/security/,
  * exercised by lakesoul-spark's RBACOperationSuite.scala), and the
  * policies make OTHER domains' namespaces/tables invisible ("cannot be
  * found") while the role split reserves NAMESPACE management to admins
  * ("permission denied for table namespace"). PostgreSQL itself is
  * unreachable in this environment, so [[JdbcMetaStore]] mirrors the same
  * observable semantics at the store API:
  *
  *   - a table whose domain differs from the caller's is INVISIBLE —
  *     `getTableInfo` answers None (so `GraftTable.forPath` fails with
  *     "no graft table", matching RLS's hidden rows) and every mutation
  *     behaves as not-found;
  *   - the `public` domain is shared: every caller sees and writes it
  *     (the reference's default single-tenant deployment, where all the
  *     other 170+ gate queries run);
  *   - only ADMINS create/drop namespaces; ordinary users create/drop
  *     tables and read/write data within their domain.
  *
  * Identity is an inheritable thread-local (store calls are driver-side):
  * the default comes from `graft.auth.user` / `graft.auth.domain` /
  * `graft.auth.admin` system properties and is public-admin when unset,
  * so single-tenant use never touches this. [[FileMetaStore]] has no
  * arbitration between identities and refuses non-public contexts
  * outright. */
case class AuthContext(user: String, domain: String, admin: Boolean) {
  def isPublic: Boolean = domain == AuthContext.PublicDomain
}

object AuthContext {
  val PublicDomain = "public"

  /** Single-tenant default (the reference's lakesoul_test/public login). */
  val Default: AuthContext = AuthContext(
    sys.props.getOrElse("graft.auth.user", "anonymous"),
    sys.props.getOrElse("graft.auth.domain", PublicDomain),
    sys.props.get("graft.auth.admin").forall(_.toBoolean))

  private val ctx = new InheritableThreadLocal[AuthContext] {
    override def initialValue(): AuthContext = Default
  }

  def current: AuthContext = ctx.get()

  /** Switch this thread's identity (the reference re-logs-in the JVM). */
  def login(user: String, domain: String, admin: Boolean = false): Unit =
    ctx.set(AuthContext(user, domain, admin))

  def logout(): Unit = ctx.set(Default)

  /** Run `body` under `a`, restoring the previous identity after. */
  def as[T](a: AuthContext)(body: => T): T = {
    val prev = ctx.get()
    ctx.set(a)
    try body finally ctx.set(prev)
  }

  /** Can `caller` see/write objects stamped with `objectDomain`? Public
    * objects are shared; otherwise domains must match (RLS visibility).
    * Role (admin) does NOT widen visibility — it only gates namespace
    * management, exactly like the reference's policy split. */
  def canAccess(caller: AuthContext, objectDomain: String): Boolean =
    objectDomain == PublicDomain || objectDomain == caller.domain
}

/** A caller attempted an operation its role forbids (namespace management
  * by a non-admin). Cross-DOMAIN access never raises this — the object is
  * invisible instead, mirroring row-level security. */
class PermissionDeniedException(msg: String) extends SecurityException(msg)
