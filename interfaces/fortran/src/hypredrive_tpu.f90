! Fortran ISO-C-binding module for the hypredrive-tpu C API.
!
! Reference counterpart: interfaces/fortran/src/hypredrive.f90 (the
! ISO-C module mirroring every HYPREDRV verb, :6).  Original TPU-native
! binding over native/include/HYPREDRV_tpu.h: handles are integer(c_int64_t),
! every call returns an integer(c_int32_t) status (0 = success)
! describable with hypredrv_error_describe.
!
! Build (needs a Fortran compiler; not shipped in the dev image):
!   gfortran -c hypredrive_tpu.f90
!   gfortran main.f90 hypredrive_tpu.o -L<repo>/native -lhypredrv_tpu
!
! Strings must be null-terminated by the caller:  trim(s)//c_null_char.

module hypredrive_tpu
  use, intrinsic :: iso_c_binding
  implicit none
  private

  public :: hypredrv_t
  integer, parameter :: hypredrv_t = c_int64_t

  interface

    ! -- lifecycle (ref: HYPREDRV.h:112-289) ------------------------------
    function HYPREDRV_Initialize() bind(c, name="HYPREDRV_Initialize") &
        result(rc)
      import :: c_int32_t
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_Finalize() bind(c, name="HYPREDRV_Finalize") result(rc)
      import :: c_int32_t
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_Create(handle) bind(c, name="HYPREDRV_Create") &
        result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), intent(inout) :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_Destroy(handle) bind(c, name="HYPREDRV_Destroy") &
        result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), intent(inout) :: handle
      integer(c_int32_t) :: rc
    end function

    ! -- error model -------------------------------------------------------
    function HYPREDRV_ErrorCodeDescribe(code) &
        bind(c, name="HYPREDRV_ErrorCodeDescribe") result(msg)
      import :: c_int32_t, c_ptr
      integer(c_int32_t), value :: code
      type(c_ptr) :: msg
    end function

    function HYPREDRV_ErrorCodeClear() &
        bind(c, name="HYPREDRV_ErrorCodeClear") result(rc)
      import :: c_int32_t
      integer(c_int32_t) :: rc
    end function

    ! -- configuration -----------------------------------------------------
    function HYPREDRV_InputArgsParse(handle, yaml) &
        bind(c, name="HYPREDRV_InputArgsParse") result(rc)
      import :: c_int32_t, c_int64_t, c_char
      integer(c_int64_t), value :: handle
      character(kind=c_char), dimension(*), intent(in) :: yaml
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_SetLibraryMode(handle) &
        bind(c, name="HYPREDRV_SetLibraryMode") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_ObjectSetName(handle, name) &
        bind(c, name="HYPREDRV_ObjectSetName") result(rc)
      import :: c_int32_t, c_int64_t, c_char
      integer(c_int64_t), value :: handle
      character(kind=c_char), dimension(*), intent(in) :: name
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_InputArgsSetPreconVariant(handle, idx) &
        bind(c, name="HYPREDRV_InputArgsSetPreconVariant") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t), value :: idx
      integer(c_int32_t) :: rc
    end function

    ! -- linear system -------------------------------------------------------
    function HYPREDRV_LinearSystemBuild(handle) &
        bind(c, name="HYPREDRV_LinearSystemBuild") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSystemSetMatrixFromCSR(handle, nrows, indptr, &
        indices, data) bind(c, name="HYPREDRV_LinearSystemSetMatrixFromCSR") &
        result(rc)
      import :: c_int32_t, c_int64_t, c_double
      integer(c_int64_t), value :: handle, nrows
      integer(c_int64_t), dimension(*), intent(in) :: indptr, indices
      real(c_double), dimension(*), intent(in) :: data
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSystemSetRHS(handle, n, values) &
        bind(c, name="HYPREDRV_LinearSystemSetRHS") result(rc)
      import :: c_int32_t, c_int64_t, c_double
      integer(c_int64_t), value :: handle, n
      real(c_double), dimension(*), intent(in) :: values
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSystemSetInitialGuess(handle, n, values) &
        bind(c, name="HYPREDRV_LinearSystemSetInitialGuess") result(rc)
      import :: c_int32_t, c_int64_t, c_double
      integer(c_int64_t), value :: handle, n
      real(c_double), dimension(*), intent(in) :: values
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSystemResetInitialGuess(handle) &
        bind(c, name="HYPREDRV_LinearSystemResetInitialGuess") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSystemSetDofmap(handle, n, labels) &
        bind(c, name="HYPREDRV_LinearSystemSetDofmap") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle, n
      integer(c_int64_t), dimension(*), intent(in) :: labels
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSystemSetInterleavedDofmap(handle, nfunc) &
        bind(c, name="HYPREDRV_LinearSystemSetInterleavedDofmap") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t), value :: nfunc
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSystemGetSolutionValues(handle, n, out) &
        bind(c, name="HYPREDRV_LinearSystemGetSolutionValues") result(rc)
      import :: c_int32_t, c_int64_t, c_double
      integer(c_int64_t), value :: handle, n
      real(c_double), dimension(*), intent(out) :: out
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSystemGetSolutionNorm(handle, out) &
        bind(c, name="HYPREDRV_LinearSystemGetSolutionNorm") result(rc)
      import :: c_int32_t, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out
      integer(c_int32_t) :: rc
    end function

    ! -- solve lifecycle ------------------------------------------------------
    function HYPREDRV_PreconCreate(handle) &
        bind(c, name="HYPREDRV_PreconCreate") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSolverCreate(handle) &
        bind(c, name="HYPREDRV_LinearSolverCreate") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSolverSetup(handle) &
        bind(c, name="HYPREDRV_LinearSolverSetup") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSolverApply(handle) &
        bind(c, name="HYPREDRV_LinearSolverApply") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_PreconDestroy(handle) &
        bind(c, name="HYPREDRV_PreconDestroy") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSolverDestroy(handle) &
        bind(c, name="HYPREDRV_LinearSolverDestroy") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    ! -- stats / getters -------------------------------------------------------
    function HYPREDRV_StatsPrint(handle) &
        bind(c, name="HYPREDRV_StatsPrint") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSolverGetNumIterations(handle, out) &
        bind(c, name="HYPREDRV_LinearSolverGetNumIterations") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t), intent(out) :: out
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSolverGetConverged(handle, out) &
        bind(c, name="HYPREDRV_LinearSolverGetConverged") result(rc)
      import :: c_int32_t, c_int64_t
      integer(c_int64_t), value :: handle
      integer(c_int32_t), intent(out) :: out
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_LinearSolverGetFinalRelativeResidualNorm(handle, out) &
        bind(c, name="HYPREDRV_LinearSolverGetFinalRelativeResidualNorm") &
        result(rc)
      import :: c_int32_t, c_int64_t, c_double
      integer(c_int64_t), value :: handle
      real(c_double), intent(out) :: out
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_AnnotateBegin(handle, name, idx) &
        bind(c, name="HYPREDRV_AnnotateBegin") result(rc)
      import :: c_int32_t, c_int64_t, c_char
      integer(c_int64_t), value :: handle
      character(kind=c_char), dimension(*), intent(in) :: name
      integer(c_int32_t), value :: idx
      integer(c_int32_t) :: rc
    end function

    function HYPREDRV_AnnotateEnd(handle, name, idx) &
        bind(c, name="HYPREDRV_AnnotateEnd") result(rc)
      import :: c_int32_t, c_int64_t, c_char
      integer(c_int64_t), value :: handle
      character(kind=c_char), dimension(*), intent(in) :: name
      integer(c_int32_t), value :: idx
      integer(c_int32_t) :: rc
    end function

  end interface

  public :: HYPREDRV_Initialize, HYPREDRV_Finalize, HYPREDRV_Create, &
            HYPREDRV_Destroy, HYPREDRV_ErrorCodeDescribe, &
            HYPREDRV_ErrorCodeClear, HYPREDRV_InputArgsParse, &
            HYPREDRV_SetLibraryMode, HYPREDRV_ObjectSetName, &
            HYPREDRV_InputArgsSetPreconVariant, HYPREDRV_LinearSystemBuild, &
            HYPREDRV_LinearSystemSetMatrixFromCSR, &
            HYPREDRV_LinearSystemSetRHS, &
            HYPREDRV_LinearSystemSetInitialGuess, &
            HYPREDRV_LinearSystemResetInitialGuess, &
            HYPREDRV_LinearSystemSetDofmap, &
            HYPREDRV_LinearSystemSetInterleavedDofmap, &
            HYPREDRV_LinearSystemGetSolutionValues, &
            HYPREDRV_LinearSystemGetSolutionNorm, HYPREDRV_PreconCreate, &
            HYPREDRV_LinearSolverCreate, HYPREDRV_LinearSolverSetup, &
            HYPREDRV_LinearSolverApply, HYPREDRV_PreconDestroy, &
            HYPREDRV_LinearSolverDestroy, HYPREDRV_StatsPrint, &
            HYPREDRV_LinearSolverGetNumIterations, &
            HYPREDRV_LinearSolverGetConverged, &
            HYPREDRV_LinearSolverGetFinalRelativeResidualNorm, &
            HYPREDRV_AnnotateBegin, HYPREDRV_AnnotateEnd
  public :: hypredrv_error_describe

contains

  !> Convenience: status code -> Fortran string.
  function hypredrv_error_describe(code) result(msg)
    integer(c_int32_t), intent(in) :: code
    character(len=:), allocatable :: msg
    type(c_ptr) :: p
    character(kind=c_char), pointer :: chars(:)
    integer :: n
    p = HYPREDRV_ErrorCodeDescribe(code)
    if (.not. c_associated(p)) then
      msg = "unknown"
      return
    end if
    call c_f_pointer(p, chars, [1024])
    n = 0
    do while (n < 1024)
      if (chars(n + 1) == c_null_char) exit
      n = n + 1
    end do
    allocate (character(len=n) :: msg)
    block
      integer :: i
      do i = 1, n
        msg(i:i) = chars(i)
      end do
    end block
  end function

end module hypredrive_tpu
